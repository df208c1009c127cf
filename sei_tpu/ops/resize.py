"""Bicubic image resize as MXU matmuls (PyTorch interpolate parity).

Public API mirrors what the reference consumes from torch
(ref: src/physics/downsampling/__init__.py:16-19, src/transforms.py:46-57,
src/models/upsample.py:5-13, src/datasets/ground_truth.py:75-81):

  * :func:`resize` - interpolate(mode="bicubic") with explicit output size or
    scale_factor, antialias on/off.
  * :func:`resize_shorter_side` - torchvision-style resize.

Layout: NCHW or CHW or HW, floats.  The per-axis resampling matrices are
numpy constants at trace time, so under ``jit`` the whole resize compiles to
two dense matmuls that XLA places on the MXU; there is no gather in the hot
path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .bicubic import output_size_for_scale, resize_matrix, shorter_side_sizes


def _apply_separable(x: jnp.ndarray, wh: np.ndarray, ww: np.ndarray) -> jnp.ndarray:
    """Apply (out_h,in_h) and (out_w,in_w) matrices along the last two axes."""
    wh = jnp.asarray(wh, dtype=x.dtype)
    ww = jnp.asarray(ww, dtype=x.dtype)
    # x: (..., H, W); rows then cols. einsum keeps everything on the MXU.
    x = jnp.einsum("oh,...hw->...ow", wh, x)
    x = jnp.einsum("ow,...hw->...ho", ww, x)
    return x


def resize(
    x: jnp.ndarray,
    *,
    size: tuple[int, int] | None = None,
    scale_factor: float | None = None,
    antialias: bool = False,
) -> jnp.ndarray:
    """Bicubic resize of the last two axes, matching torch interpolate.

    Exactly one of ``size`` / ``scale_factor`` must be given.  With
    ``scale_factor``, the output size is ``floor(in * sf)`` and the source
    step used for weights is ``1/sf`` (torch convention when a scale factor
    is passed through to the kernel).
    """
    h, w = x.shape[-2], x.shape[-1]
    if (size is None) == (scale_factor is None):
        raise ValueError("pass exactly one of size / scale_factor")
    if scale_factor is not None:
        out_h = output_size_for_scale(h, scale_factor)
        out_w = output_size_for_scale(w, scale_factor)
        scale_h = scale_w = 1.0 / scale_factor
    else:
        out_h, out_w = size
        scale_h = h / out_h
        scale_w = w / out_w
    if (out_h, out_w) == (h, w) and scale_h == 1.0 and scale_w == 1.0:
        return x
    wh = resize_matrix(h, out_h, antialias=antialias, scale=scale_h)
    ww = resize_matrix(w, out_w, antialias=antialias, scale=scale_w)
    return _apply_separable(x, wh, ww)


def resize_shorter_side(x: jnp.ndarray, size: int, *, antialias: bool = True) -> jnp.ndarray:
    """torchvision ``TF.resize(x, size=int, BICUBIC, antialias=True)`` parity.

    Used for ground-truth preprocessing (ref: src/datasets/ground_truth.py:72-83).
    """
    h, w = x.shape[-2], x.shape[-1]
    out_h, out_w = shorter_side_sizes(h, w, size)
    if (out_h, out_w) == (h, w):
        return x
    return resize(x, size=(out_h, out_w), antialias=antialias)


def resize_np(x: np.ndarray, **kwargs) -> np.ndarray:
    """Numpy twin of :func:`resize` for host-side data preprocessing."""
    h, w = x.shape[-2], x.shape[-1]
    size = kwargs.get("size")
    scale_factor = kwargs.get("scale_factor")
    antialias = kwargs.get("antialias", False)
    if scale_factor is not None:
        out_h = output_size_for_scale(h, scale_factor)
        out_w = output_size_for_scale(w, scale_factor)
        scale_h = scale_w = 1.0 / scale_factor
    else:
        out_h, out_w = size
        scale_h = h / out_h
        scale_w = w / out_w
    wh = resize_matrix(h, out_h, antialias=antialias, scale=scale_h).astype(x.dtype)
    ww = resize_matrix(w, out_w, antialias=antialias, scale=scale_w).astype(x.dtype)
    x = np.einsum("oh,...hw->...ow", wh, x)
    x = np.einsum("ow,...hw->...ho", ww, x)
    return x


def resize_shorter_side_np(x: np.ndarray, size: int, *, antialias: bool = True) -> np.ndarray:
    h, w = x.shape[-2], x.shape[-1]
    out_h, out_w = shorter_side_sizes(h, w, size)
    if (out_h, out_w) == (h, w):
        return x
    return resize_np(x, size=(out_h, out_w), antialias=antialias)
