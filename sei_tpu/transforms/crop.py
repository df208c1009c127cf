"""Aligned pair cropping on-device (parity: ref src/crop.py:8-57).

``crop_pair`` pads both images to a minimum size then takes one crop offset on
y and the ratio-scaled offset on x, keeping SR pairs aligned.  Offsets are
computed from an explicit key with the same integer distribution as
``torch.randint(0, h - size + 1)``; crops use ``lax.dynamic_slice`` so the
whole thing stays inside a jitted step with static output shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad_min_size(x: jnp.ndarray, size_h: int, size_w: int) -> jnp.ndarray:
    """Constant-pad the bottom/right to reach a minimum size (ref :42-57)."""
    h, w = x.shape[-2], x.shape[-1]
    ph = max(0, size_h - h)
    pw = max(0, size_w - w)
    if ph == 0 and pw == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
    return jnp.pad(x, pad)


def crop_pair(
    x: jnp.ndarray,
    y: jnp.ndarray,
    *,
    size: int,
    location: str = "random",
    xy_size_ratio: int = 1,
    key: jax.Array | None = None,
):
    """Aligned crop of (x, y): y gets ``size``, x gets ``size*ratio``.

    Works on (..., H, W).  ``location`` in {"random", "center"}; random needs
    a key.  Returns (x_crop, y_crop).
    """
    r = int(xy_size_ratio)
    x = _pad_min_size(x, size * r, size * r)
    y = _pad_min_size(y, size, size)
    h, w = y.shape[-2], y.shape[-1]
    if location == "random":
        assert key is not None
        ki, kj = jax.random.split(key)
        i = jax.random.randint(ki, (), 0, h - size + 1)
        j = jax.random.randint(kj, (), 0, w - size + 1)
    elif location == "center":
        i = jnp.asarray((h - size) // 2)
        j = jnp.asarray((w - size) // 2)
    else:
        raise ValueError(f"unknown crop location: {location}")

    def crop(img, top, left, hh, ww):
        lead = img.shape[:-2]
        starts = [jnp.zeros((), jnp.int32)] * len(lead) + [top, left]
        sizes = list(lead) + [hh, ww]
        return jax.lax.dynamic_slice(img, starts, sizes)

    x_crop = crop(x, i * r, j * r, size * r, size * r)
    y_crop = crop(y, i, j, size, size)
    return x_crop, y_crop


def crop_pair_batch(
    x: jnp.ndarray,
    y: jnp.ndarray,
    *,
    size: int,
    xy_size_ratio: int = 1,
    key: jax.Array | None = None,
    location: str = "random",
):
    """Per-image independent random crops over a batch (vmapped).

    The reference crops per item on the host dataloader; on TPU we vmap the
    dynamic-slice crop over the batch with split keys.
    """
    b = y.shape[0]
    if location == "random":
        keys = jax.random.split(key, b)
    else:
        keys = jnp.zeros((b, 2), dtype=jnp.uint32)

    def one(xi, yi, ki):
        return crop_pair(
            xi, yi, size=size, location=location, xy_size_ratio=xy_size_ratio, key=ki
        )

    return jax.vmap(one)(x, y, keys)
