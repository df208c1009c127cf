"""Measurement discipline for jitted-step micro-benchmarks on TPU.

Two failure modes silently corrupt naive `time a jitted fn in a loop`
benchmarks through remote-TPU execution layers (both bit us in round 3;
see STATUS.md "Probe-methodology findings"):

1. **Result replay / dedup**: execution services may cache identical
   (executable, inputs) pairs - including across processes - and replay
   the result in ~0 ms.  Feeding a jitted fn the SAME arrays every
   iteration (or a perturbation that rounds away, e.g. ``x * (1+1e-6)``
   in bfloat16) measures the cache, not the chip.
2. **Trace-cache poisoning**: ``jax.jit(f)`` keyed on the function object
   reuses earlier traces of ``f``.  Sweeping trace-time knobs (env vars
   read during tracing) across legs that jit the SAME module-level
   function silently re-runs the FIRST leg's executable.  Worse, a
   garbage-collected function's id can be recycled, so even fresh
   lambdas can collide unless a strong reference is held.

``bench_leg`` encapsulates the countermeasures: a fresh uniquely-named
closure per leg (kept alive for the process lifetime), and a distinct,
representable input perturbation per timed call.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

_KEEP: list = []  # strong refs: never let a timed closure's id be recycled
_SEQ = [0]


def bench_leg(
    make_fn: Callable[[], Callable],
    x: jax.Array,
    *,
    iters: int = 20,
    windows: int = 3,
    offset: float = 0.0,
    name: str | None = None,
) -> float:
    """Median per-call milliseconds of ``make_fn()(x_perturbed, t)``.

    ``make_fn`` must return a function ``fn(x, t)`` that folds the scalar
    ``t`` into its computation (e.g. ``x + t``) so every timed call has a
    distinct input.  ``offset`` should be unique per benchmarking session
    (replay caches can persist across processes).  A fresh jitted wrapper
    with a unique ``__name__`` is created and kept alive.
    """
    fn = make_fn()
    _SEQ[0] += 1
    fn.__name__ = name or f"bench_leg_{_SEQ[0]}"
    _KEEP.append(fn)
    jfn = jax.jit(fn)
    ts = [jnp.float32(offset + i) for i in range(iters * windows + 1)]
    out = jfn(x, ts[0])
    jax.block_until_ready(out)
    meds = []
    k = 1
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(x, ts[k])
            k += 1
        jax.block_until_ready(out)
        meds.append((time.perf_counter() - t0) / iters * 1000)
    return sorted(meds)[len(meds) // 2]


def sweep(
    legs: Sequence[tuple[str, dict, Callable[[], Callable]]],
    x: jax.Array,
    *,
    offset: float = 0.0,
    setenv: Callable[[str, str], None] | None = None,
) -> dict:
    """Run labeled legs ``(tag, env_overrides, make_fn)`` safely.

    Env overrides are applied around each leg (trace-time knobs); every
    leg gets a fresh closure via :func:`bench_leg`, so knob changes
    actually take effect.  Returns {tag: ms}.
    """
    import os

    results = {}
    for i, (tag, env, make_fn) in enumerate(legs):
        saved = {}
        for k, v in env.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = str(v)
        try:
            results[tag] = bench_leg(make_fn, x, offset=offset + 1000 * i,
                                     name=f"sweep_{i}_{tag[:20]}")
        finally:
            for k, old in saved.items():
                if old is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = old
    return results
