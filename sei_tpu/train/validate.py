"""In-training validation: mechanized operating-point selection.

The reference selects its operating checkpoint by validation after training;
here the trainer can do it DURING the run: every ``eval_interval`` epochs the
val split is evaluated with the exact test protocol (deterministic per-image
measurement seeds, 8-bit quantize+clamp, Y-channel PSNR/SSIM — ref
demo/test.py:126-148 + src/metrics.py:10-18), the trajectory is appended to
``validation.csv``, and the best-PSNR state is checkpointed as ``ckp_best``.
This replaces the post-hoc queue evals used on drifting dead-leaves runs
(STATUS r3: the loss-min checkpoint is the honest operating point).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class ValidationHook:
    """Callable ``hook(params) -> (psnr, ssim)`` over a frozen val set.

    Measurement pairs are synthesized once at construction with the same
    deterministic seeds as demo/test.py; model application uses the same
    reflect-pad shape bucketing (one XLA compile per width bucket).
    """

    def __init__(
        self,
        gt,  # GroundTruthDataset (val split)
        physics,
        apply_fn,  # model.apply_fn(params, y) -> x_hat
        *,
        max_images: Optional[int] = None,
        pad_bucket: int = 64,
    ):
        self.physics = physics
        self.apply_fn = apply_fn
        self.pad_bucket = pad_bucket
        self.f_scale = physics.rate if physics.task == "sr" else 1
        base_key = jax.random.PRNGKey(0)
        n = len(gt) if max_images is None else min(len(gt), max_images)
        self.pairs = []
        rate = self.f_scale
        for i in range(n):
            x = np.asarray(gt[i])
            y = np.asarray(
                physics.randomly_degrade(
                    jnp.asarray(x)[None], base_key, seed=gt.unique_id(i)
                )[0]
            )
            if x.shape[-2:] != tuple(np.array(y.shape[-2:]) * rate):
                x = x[..., : y.shape[-2] * rate, : y.shape[-1] * rate]
            self.pairs.append((x, y))
        self._jitted = jax.jit(lambda p, y: self.apply_fn(p, y))

    def __call__(self, params) -> tuple[float, float]:
        from ..metrics import compute_metrics, quantize_and_clamp

        psnrs, ssims = [], []
        for x, y in self.pairs:
            yj = jnp.asarray(y)[None]
            h, w = yj.shape[-2], yj.shape[-1]
            b = self.pad_bucket
            ph, pw = (-h) % b, (-w) % b
            if ph or pw:
                yj = jnp.pad(yj, ((0, 0), (0, 0), (0, ph), (0, pw)), mode="reflect")
            out = self._jitted(params, yj)[
                ..., : h * self.f_scale, : w * self.f_scale
            ]
            x_hat = quantize_and_clamp(out)[0]
            xq = quantize_and_clamp(jnp.asarray(x))
            p, s, _ = compute_metrics(xq, x_hat)
            psnrs.append(p)
            ssims.append(s)
        return float(np.mean(psnrs)), float(np.mean(ssims))
