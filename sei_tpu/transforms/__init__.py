"""Augmentation groups for equivariant-imaging losses.

``ScalingTransform`` is the paper's contribution (random rescaling,
ref src/transforms.py:148-166); ``rotate`` / ``shift`` realize the EI-rotate /
EI-shift baselines (deepinv Rotate/Shift consumed at
ref src/losses/__init__.py:86-94).  All transforms are pure
``f(key, x) -> x`` functions safe inside one jitted train step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..ops.scaling import normal_scaling_transform, padded_scaling_transform
from .crop import crop_pair, crop_pair_batch  # noqa: F401

DEFAULT_RATES = (0.75, 0.5)


@dataclasses.dataclass(frozen=True)
class ScalingTransform:
    """Random downscale by a rate in ``rates`` (default {0.75, 0.5}).

    kind="padded" (default): per-image rate and random center, same-size
    output via reflected bicubic resampling.  kind="normal": one batch-wide
    rate, output shrinks - the rate must then be chosen *outside* jit (static
    shapes), see :meth:`normal_static`.
    """

    kind: str = "padded"
    antialias: bool = False
    rates: Sequence[float] = DEFAULT_RATES

    def __call__(self, key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "padded":
            return self.padded(key, x)
        raise ValueError(
            "normal kind has data-dependent output shape; use normal_static"
            if self.kind == "normal"
            else f"Unknown kind: {self.kind}"
        )

    def sample_params(self, key: jax.Array, batch: int):
        """Per-image (rate, rate_idx, center) with the reference distribution
        (ref src/transforms.py:5-24: floor(N*U) index, center ~ 2U-1)."""
        k1, k2 = jax.random.split(key)
        n = len(self.rates)
        idx = jnp.floor(
            n * jax.random.uniform(k1, (batch,), dtype=jnp.float32)
        ).astype(jnp.int32)
        idx = jnp.clip(idx, 0, n - 1)
        rates = jnp.asarray(self.rates, dtype=jnp.float32)[idx]
        center = 2.0 * jax.random.uniform(k2, (batch, 2), dtype=jnp.float32) - 1.0
        return rates, idx, center

    def padded(self, key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        rates, idx, center = self.sample_params(key, x.shape[0])
        return padded_scaling_transform(
            x,
            rates.astype(x.dtype),
            center.astype(x.dtype),
            antialias=self.antialias,
            rate_values=tuple(self.rates),
            rate_idx=idx,
        )

    def normal_static(self, rate: float, x: jnp.ndarray) -> jnp.ndarray:
        """'normal' kind at a static rate (trainer picks the rate per step)."""
        return normal_scaling_transform(x, rate, antialias=self.antialias)


def shift(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Random cyclic shift (deepinv Shift parity: roll by U[0,H) x U[0,W))."""
    kh, kw = jax.random.split(key)
    h, w = x.shape[-2], x.shape[-1]
    sh = jax.random.randint(kh, (), 0, h)
    sw = jax.random.randint(kw, (), 0, w)
    return jnp.roll(x, (sh, sw), axis=(-2, -1))


def rotate_image(
    x: jnp.ndarray, angle_deg: jnp.ndarray, mode: str = "nearest"
) -> jnp.ndarray:
    """torchvision-parity rotation of (..., H, W) about the image center.

    Replicates ``torchvision.transforms.functional.rotate(img, angle)``
    exactly (counter-clockwise degrees, expand=False, fill=0, default
    center): the inverse affine map from torchvision's
    ``_get_inverse_affine_matrix`` (pure rotation: rot = -angle) applied on
    the centered pixel grid with the half-pixel offset d=0.5 of
    ``_gen_affine_grid``, then grid_sample semantics with
    ``align_corners=False`` and ``padding_mode="zeros"``.  deepinv v0.2.0's
    ``Rotate`` (consumed at ref src/losses/__init__.py:86-94) calls this
    torchvision function with its default interpolation, which is NEAREST.
    """
    h, w = x.shape[-2], x.shape[-1]
    dt = x.dtype
    # centered pixel coords with torchvision's d=0.5 offset
    px = jnp.arange(w, dtype=dt) - (w * 0.5 - 0.5)
    py = jnp.arange(h, dtype=dt) - (h * 0.5 - 0.5)
    yy, xx = jnp.meshgrid(py, px, indexing="ij")
    rot = -angle_deg * (jnp.pi / 180.0)  # torchvision passes -angle
    ct, st = jnp.cos(rot), jnp.sin(rot)
    # inverse matrix [[cos, sin, 0], [-sin, cos, 0]] applied to (px, py)
    sx = ct * xx + st * yy + (w * 0.5 - 0.5)
    sy = -st * xx + ct * yy + (h * 0.5 - 0.5)

    def gather(ix, iy):
        inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        v = x[..., iyc, ixc]
        return jnp.where(inb, v, jnp.zeros((), dt))

    if mode == "nearest":
        # grid_sample 'nearest' rounds the unnormalized coord half-up via
        # floor(c + 0.5) (ATen's compute_coordinates + nearest rounding)
        return gather(jnp.floor(sx + 0.5), jnp.floor(sy + 0.5))
    if mode != "bilinear":
        raise ValueError(f"Unknown interpolation: {mode}")
    x0, y0 = jnp.floor(sx), jnp.floor(sy)
    tx, ty = sx - x0, sy - y0
    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def sample_rotate_angle(key: jax.Array) -> jnp.ndarray:
    """deepinv v0.2.0 Rotate angle draw: permutation of arange(0,360)[1:],
    first entry — i.e. uniform over the 359 NONZERO integer degrees."""
    return jax.random.randint(key, (), 1, 360)


def rotate(key: jax.Array, x: jnp.ndarray, mode: str = "nearest") -> jnp.ndarray:
    """Random rotation: one integer degree, uniform over {1..359}, for the
    whole batch (EI-rotate baseline).

    deepinv v0.2.0 ``Rotate`` with group_size=360 draws a permutation of
    ``arange(0, 360)[1:]`` and takes the first entry — i.e. uniform over the
    359 nonzero integer degrees, one angle shared by the batch — then calls
    torchvision rotate with default (NEAREST) interpolation.
    """
    deg = sample_rotate_angle(key).astype(x.dtype)
    return rotate_image(x, deg, mode=mode)


def combined(transforms: Sequence[Callable]) -> Callable:
    """Sequential composition with split keys (ref CombinedTransform)."""

    def apply(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        keys = jax.random.split(key, len(transforms))
        for t, k in zip(transforms, keys):
            x = t(k, x)
        return x

    return apply


def get_ei_transform(name: str, *, kind: str = "padded", antialias: bool = False):
    """Transform registry (ref src/losses/__init__.py:84-96)."""
    if name == "Scaling_Transforms":
        return ScalingTransform(kind=kind, antialias=antialias)
    if name == "Rotations+Shifts":
        return combined([rotate, shift])
    if name == "Rotations":
        return rotate
    if name == "Shifts":
        return shift
    raise ValueError(f"Unknown transforms: {name}")
