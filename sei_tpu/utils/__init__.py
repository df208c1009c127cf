"""Utilities: profiling/tracing and throughput metering.

The reference has no tracing/profiling (SURVEY.md section 5.1: a wall-clock
timestamp per epoch line is the only timing artifact).  Here: a
``jax.profiler`` trace context for the train step, and a StepMeter that logs
steps/sec and images/sec with jitter-free monotonic timing.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepMeter:
    """Running throughput: call .tick(batch) per step; read .summary()."""

    warmup: int = 2
    _t0: float = field(default=0.0, init=False)
    _steps: int = field(default=0, init=False)
    _images: int = field(default=0, init=False)
    _seen: int = field(default=0, init=False)

    def tick(self, batch_size: int):
        self._seen += 1
        if self._seen == self.warmup:
            self._t0 = time.monotonic()
            return
        if self._seen > self.warmup:
            self._steps += 1
            self._images += batch_size

    def summary(self) -> dict:
        dt = time.monotonic() - self._t0 if self._t0 else 0.0
        return {
            "steps": self._steps,
            "wall_s": round(dt, 3),
            "steps_per_sec": round(self._steps / dt, 3) if dt > 0 else 0.0,
            "images_per_sec": round(self._images / dt, 3) if dt > 0 else 0.0,
        }
