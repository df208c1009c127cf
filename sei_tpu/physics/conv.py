"""Spatial blur operator (v1, non-default) with explicit padding modes.

Parity target: ref src/physics/blur/__init__.py:34-194 (Blur).  The reference
performs *true* convolution (filter flipped), extends even-sized filters to
odd, and offers valid/circular/reflect/replicate padding.  We implement the
forward with ``lax.conv_general_dilated`` after manual padding and derive the
exact adjoint with ``jax.linear_transpose`` (the reference hand-assembles the
boundary wrap-arounds; linear transposition gives the same operator by
construction).  Only used when ``--no-physics_v2``; the FFT path is default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_PAD_MODE = {"circular": "wrap", "reflect": "reflect", "replicate": "edge"}


def _extend_filter(k: jnp.ndarray) -> jnp.ndarray:
    """Zero-extend even-sized (or size-1) filters to odd size (ref :9-31)."""
    h, w = k.shape
    h_new, w_new, oh, ow = h, w, 0, 0
    if w == 1:
        w_new, ow = 3, 1
    elif w % 2 == 0:
        w_new += 1
    if h == 1:
        h_new, oh = 3, 1
    elif h % 2 == 0:
        h_new += 1
    out = jnp.zeros((h_new, w_new), dtype=k.dtype)
    return out.at[oh : h + oh, ow : w + ow].set(k)


def blur_spatial(x: jnp.ndarray, kernel: jnp.ndarray, *, padding: str = "circular") -> jnp.ndarray:
    """True convolution of (B,C,H,W) by a single 2-D kernel, all channels."""
    k = _extend_filter(kernel.astype(x.dtype)[..., :, :].reshape(kernel.shape[-2], kernel.shape[-1]))
    k = k[::-1, ::-1]  # true convolution, like the reference's double flip
    ph = (k.shape[0] - 1) // 2
    pw = (k.shape[1] - 1) // 2
    if padding != "valid":
        x = jnp.pad(
            x,
            ((0, 0), (0, 0), (ph, ph), (pw, pw)),
            mode=_PAD_MODE[padding],
        )
    c = x.shape[1]
    # depthwise: same kernel per channel
    kd = jnp.tile(k[None, None], (c, 1, 1, 1))  # (C,1,kh,kw)
    return jax.lax.conv_general_dilated(
        x,
        kd,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )


def blur_spatial_adjoint(
    y: jnp.ndarray, kernel: jnp.ndarray, *, padding: str = "circular"
) -> jnp.ndarray:
    """Exact adjoint of :func:`blur_spatial` via linear transposition."""
    if padding == "valid":
        k = _extend_filter(kernel.reshape(kernel.shape[-2], kernel.shape[-1]))
        ph, pw = k.shape[0] - 1, k.shape[1] - 1
        in_shape = (*y.shape[:-2], y.shape[-2] + ph, y.shape[-1] + pw)
    else:
        in_shape = y.shape
    fn = partial(blur_spatial, kernel=kernel.astype(y.dtype), padding=padding)
    t = jax.linear_transpose(fn, jax.ShapeDtypeStruct(in_shape, y.dtype))
    return t(y)[0]
