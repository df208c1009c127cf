"""LPIPS perceptual metric (AlexNet variant) in JAX.

The reference computes LPIPS through pyiqa (ref src/metrics.py:20-30), which
downloads AlexNet + linear-head weights at runtime.  This environment has no
network egress, so construction takes a local torch checkpoint containing
BOTH the torchvision AlexNet features ("features.*") and the LPIPS linear
heads ("lin{0..4}.model.1.weight"); sei_tpu/metrics/__init__.py returns NaN
when no weights are supplied.

Pipeline (Zhang et al. 2018): scale inputs from [0,1] to [-1,1], normalize by
ImageNet-ish shift/scale, run AlexNet conv features, unit-normalize each
channel vector, squared difference, 1x1 linear head per layer, spatial mean,
sum over the 5 layers.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

# LPIPS input normalization constants (Zhang et al. reference implementation)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision AlexNet conv configuration: (out_ch, kernel, stride, padding)
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# features module indices of the conv layers in torchvision AlexNet
_ALEX_IDX = [0, 3, 6, 8, 10]
# maxpool after conv idx (by conv position)
_POOL_AFTER = {0, 1}  # pools after conv0 and conv1 (and after conv4, unused)


class LPIPS:
    def __init__(self, weights_path: str):
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=False)
        sd = {k: np.asarray(v) for k, v in sd.items() if hasattr(v, "numpy") or isinstance(v, np.ndarray)}
        self.convs = []
        for ci, fi in enumerate(_ALEX_IDX):
            w = sd[f"features.{fi}.weight"].transpose(2, 3, 1, 0)
            b = sd[f"features.{fi}.bias"]
            self.convs.append((jnp.asarray(w), jnp.asarray(b)))
        self.lins = []
        for i in range(5):
            key = f"lin{i}.model.1.weight"
            if key not in sd:
                key = f"lins.{i}.model.1.weight"
            self.lins.append(jnp.asarray(sd[key].reshape(-1)))
        self._fn = jax.jit(self._lpips)

    def _features(self, x):
        # x: (B, 3, H, W) in [-1, 1] normalized
        feats = []
        h = jnp.transpose(x, (0, 2, 3, 1))
        for ci, ((w, b), cfg) in enumerate(zip(self.convs, _ALEX_CONVS)):
            _, k, s, p = cfg
            h = jax.lax.conv_general_dilated(
                h, w, (s, s), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            h = jax.nn.relu(h)
            feats.append(h)
            if ci in _POOL_AFTER:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
                )
        return feats

    def _lpips(self, x_hat, x):
        def norm_input(t):
            t = 2.0 * t - 1.0
            return (t - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]

        fa = self._features(norm_input(x_hat))
        fb = self._features(norm_input(x))
        total = 0.0
        for a, b, lin in zip(fa, fb, self.lins):
            an = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            bn = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
            d = (an - bn) ** 2
            total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
        return total

    def __call__(self, x_hat, x):
        x_hat = jnp.asarray(x_hat)
        x = jnp.asarray(x)
        if x_hat.ndim == 3:
            x_hat = x_hat[None]
        if x.ndim == 3:
            x = x[None]
        return float(self._fn(x_hat, x)[0])
