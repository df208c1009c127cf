"""Random-scale resampling (the paper's core augmentation) as batched matmuls.

Reference semantics (src/transforms.py:27-109): per-image downscaling rate in
{0.75, 0.5} and random center in [-1,1]^2; an affine sampling grid
``g = (v - c)/rate + c`` over normalized coordinates; bicubic
``grid_sample`` with reflection padding and ``align_corners=True``; optional
per-image antialiased pre-resize.

TPU-first design: the grid is separable (pure per-axis affine), so the sample
is ``M_v @ img @ M_u^T`` with per-image (out, in) matrices.  The matrices are
built in-graph from traced rates/centers via 4 one-hot scatter adds (tiny:
48x48 in training), and the application is a batched MXU matmul - no gather.

Note: the reference builds its grid with a ``view`` that is only coherent for
square images (src/transforms.py:35-37 builds (w,h,2) and views it as
(h,w,2)); training always uses square crops.  We implement the square-image
semantics and require H == W.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .bicubic import cubic_weights_from_frac, output_size_for_scale, resize_matrix


def _reflect_coords(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """torch grid_sample 'reflection' padding with align_corners=True.

    Reflect about pixel centers [0, size-1], then clamp.  Matches ATen
    ``reflect_coordinates(in, 0, 2*(size-1))`` followed by ``clip``.
    """
    if size == 1:
        return jnp.zeros_like(x)
    span = float(size - 1)
    x = jnp.abs(x)
    extra = jnp.mod(x, span)
    flips = jnp.floor(x / span)
    x = jnp.where(jnp.mod(flips, 2.0) == 0.0, extra, span - extra)
    return jnp.clip(x, 0.0, span)


def scaling_sample_matrix_1d(
    n_out: int, n_in: int, rate: jnp.ndarray, center: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    """(n_out, n_in) bicubic sampling matrix for one axis of one image.

    Output coordinate ``a`` samples the input at normalized
    ``g = (v_a - center)/rate + center`` with ``v_a = 2/n_out * a - 1``
    (the reference normalizes by the *pre-resize* shape), unnormalized with
    align_corners=True over ``n_in`` pixels.
    """
    a = jnp.arange(n_out, dtype=dtype)
    v = 2.0 / n_out * a - 1.0
    g = (v - center) / rate + center
    px = (g + 1.0) * 0.5 * (n_in - 1)
    base = jnp.floor(px)
    t = px - base
    ws = cubic_weights_from_frac(t)  # 4 x (n_out,)
    m = jnp.zeros((n_out, n_in), dtype=dtype)
    for tap in range(4):
        coord = base - 1.0 + tap
        idx = _reflect_coords(coord, n_in).astype(jnp.int32)
        m = m + jax.nn.one_hot(idx, n_in, dtype=dtype) * ws[tap][:, None]
    return m


def _sample_one(img, rate, cx, cy, *, n_h, n_w, in_h, in_w):
    """img: (C, in_h, in_w) -> (C, n_h, n_w)."""
    mv = scaling_sample_matrix_1d(n_h, in_h, rate, cy, dtype=img.dtype)
    mu = scaling_sample_matrix_1d(n_w, in_w, rate, cx, dtype=img.dtype)
    return jnp.einsum("oh,chw,pw->cop", mv, img, mu)


def padded_scaling_transform(
    x: jnp.ndarray,
    rates: jnp.ndarray,
    centers: jnp.ndarray,
    *,
    antialias: bool = False,
    rate_values: tuple[float, ...] = (0.75, 0.5),
    rate_idx: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Padded (same-size) random-scale transform of a batch.

    Args:
      x: (B, C, H, W) with H == W (see module docstring).
      rates: (B,) per-image downscaling rate (values from ``rate_values``).
      centers: (B, 2) per-image (cx, cy) in [-1, 1] (ref order: channel 0
        pairs with the x coordinate).
      antialias: per-image antialiased pre-resize before sampling
        (ref src/transforms.py:46-57).  Requires ``rate_idx``.
      rate_idx: (B,) int index of each image's rate into ``rate_values``
        (needed to give each antialias branch a static shape).
    """
    b, c, h, w = x.shape
    assert h == w, "reference grid semantics are only defined for square images"
    cx = centers[:, 0]
    cy = centers[:, 1]

    if not antialias:
        f = partial(_sample_one, n_h=h, n_w=w, in_h=h, in_w=w)
        return jax.vmap(f)(x, rates, cx, cy)

    assert rate_idx is not None, "antialias path needs static rate indices"
    # Each branch: constant antialiased pre-resize to floor(h*r) then sample
    # back to (h, w).  lax.switch keeps every branch static-shaped.
    branches = []
    for r in rate_values:
        rh = output_size_for_scale(h, r)
        rw = output_size_for_scale(w, r)
        pre_h = resize_matrix(h, rh, antialias=True, scale=1.0 / r)
        pre_w = resize_matrix(w, rw, antialias=True, scale=1.0 / r)

        def branch(img, rate, cx1, cy1, pre_h=pre_h, pre_w=pre_w, rh=rh, rw=rw):
            ph = jnp.asarray(pre_h, dtype=img.dtype)
            pw = jnp.asarray(pre_w, dtype=img.dtype)
            small = jnp.einsum("oh,chw,pw->cop", ph, img, pw)
            return _sample_one(small, rate, cx1, cy1, n_h=h, n_w=w, in_h=rh, in_w=rw)

        branches.append(branch)

    def per_image(img, idx, rate, cx1, cy1):
        return jax.lax.switch(idx, branches, img, rate, cx1, cy1)

    return jax.vmap(per_image)(x, rate_idx, rates, cx, cy)


def normal_scaling_transform(x: jnp.ndarray, rate: float, *, antialias: bool) -> jnp.ndarray:
    """'normal' kind: one batch-wide bicubic downscale; output shrinks.

    ``rate`` must be a static Python float (the output shape depends on it);
    the trainer dispatches between the precompiled variants per step
    (ref src/transforms.py:112-145 samples one rate per batch).
    """
    from .resize import resize

    return resize(x, scale_factor=rate, antialias=antialias)
