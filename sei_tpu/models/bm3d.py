"""BM3D denoising + BM3D-DEB deblurring, from scratch in JAX.

The reference wraps the compiled Tampere ``bm3d`` wheel on CPU per channel
(ref src/models/bm3d_deblurring.py:8-31); that binary is not in this image,
so this is a from-scratch reimplementation of the classic algorithm
(Dabov et al. 2007) that runs on TPU:

  stage 1 (hard threshold): for each reference patch on a stride grid, gather
  the K most similar patches in a local search window (block matching via
  top-k over SSDs), 3-D transform (2-D DCT per patch + 1-D Haar across the
  group), hard-threshold, inverse, aggregate with sparsity weights;
  stage 2 (Wiener): same grouping, empirical Wiener shrinkage using the
  stage-1 estimate as the pilot.

Deblurring (BM3D-DEB, Dabov et al. 2008, simplified): regularized-inverse
deconvolution in Fourier, then the two BM3D stages with the effective noise
level of the inverted spectrum.

All shapes static; block matching is vmapped gathers + top_k.  This is a
capability reimplementation, not bit-parity with the Tampere binary.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fft_conv import psf_to_otf


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n, n)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * math.sqrt(2.0 / n)
    m[0] /= math.sqrt(2.0)
    return m.astype(np.float32)


def _haar_matrix(n: int) -> np.ndarray:
    """Orthonormal Haar-like transform for the group axis (n power of 2)."""
    assert (n & (n - 1)) == 0
    m = np.array([[1.0]])
    while m.shape[0] < n:
        top = np.kron(m, [1.0, 1.0])
        bot = np.kron(np.eye(m.shape[0]), [1.0, -1.0])
        m = np.vstack([top, bot]) / math.sqrt(2.0)
    return m.astype(np.float32)


@partial(jax.jit, static_argnames=("patch", "stride", "search", "k", "two_stage"))
def bm3d_denoise(
    z: jnp.ndarray,
    sigma: float,
    *,
    patch: int = 8,
    stride: int = 4,
    search: int = 12,
    k: int = 8,
    two_stage: bool = True,
) -> jnp.ndarray:
    """BM3D denoising of a single-channel (H, W) image in [0,1]."""
    h, w = z.shape
    p = patch
    # pad so the stride grid + search window stay in bounds
    pad = search + p
    zp = jnp.pad(z, pad, mode="reflect")

    # reference grid
    ys = np.arange(0, h, stride)
    xs = np.arange(0, w, stride)
    ref_y, ref_x = np.meshgrid(ys, xs, indexing="ij")
    ref = np.stack([ref_y.ravel(), ref_x.ravel()], 1) + pad  # (R, 2)
    n_ref = ref.shape[0]

    # candidate offsets within the search window (odd grid, includes (0,0))
    offs = []
    for dy in range(-search, search + 1, 3):
        for dx in range(-search, search + 1, 3):
            offs.append((dy, dx))
    offs = jnp.asarray(np.array(offs, np.int32))  # (C, 2)

    dct = jnp.asarray(_dct_matrix(p))
    haar = jnp.asarray(_haar_matrix(k))

    def extract(img, cy, cx):
        # (p, p) patch at top-left (cy, cx) via dynamic slice
        return jax.lax.dynamic_slice(img, (cy, cx), (p, p))

    def group_for(img, pilot, cy, cx):
        refp = extract(pilot, cy, cx)
        cand = jax.vmap(lambda o: extract(pilot, cy + o[0], cx + o[1]))(offs)
        ssd = jnp.sum((cand - refp[None]) ** 2, axis=(1, 2))
        _, top = jax.lax.top_k(-ssd, k)  # most similar k
        sel = offs[top]  # (k, 2)
        grp = jax.vmap(lambda o: extract(img, cy + o[0], cx + o[1]))(sel)
        return grp, sel

    def transform(grp):
        # 2-D DCT per patch then Haar across the group axis
        t = jnp.einsum("ab,kbc,dc->kad", dct, grp, dct)
        return jnp.einsum("gk,kad->gad", haar, t)

    def itransform(coef):
        t = jnp.einsum("kg,gad->kad", haar.T, coef)
        # inverse 2-D DCT: D^T X D (orthonormal)
        return jnp.einsum("ab,kad,dc->kbc", dct, t, dct)

    def stage(img, pilot, wiener: bool):
        def one(refyx):
            cy, cx = refyx[0], refyx[1]
            grp, sel = group_for(img, pilot, cy, cx)
            coef = transform(grp)
            if not wiener:
                thr = 2.7 * sigma
                keep = jnp.abs(coef) > thr
                coef = jnp.where(keep, coef, 0.0)
                nz = jnp.sum(keep).astype(jnp.float32)
                wgt = 1.0 / (nz + 1.0)
            else:
                pgrp, _ = group_for(pilot, pilot, cy, cx)
                pcoef = transform(pgrp)
                shrink = pcoef**2 / (pcoef**2 + sigma**2)
                coef = coef * shrink
                wgt = 1.0 / (jnp.sum(shrink**2) * sigma**2 + 1e-8)
            est = itransform(coef)
            return est, sel, wgt

        ests, sels, wgts = jax.vmap(one)(jnp.asarray(ref))

        # aggregation: scatter weighted patches back
        num = jnp.zeros_like(zp)
        den = jnp.zeros_like(zp)
        ref_arr = jnp.asarray(ref)

        def body(i, acc):
            num, den = acc
            cy, cx = ref_arr[i, 0], ref_arr[i, 1]

            def inner(j, acc2):
                num, den = acc2
                oy = sels[i, j, 0]
                ox = sels[i, j, 1]
                patch_est = ests[i, j] * wgts[i]
                num = jax.lax.dynamic_update_slice(
                    num,
                    jax.lax.dynamic_slice(num, (cy + oy, cx + ox), (p, p))
                    + patch_est,
                    (cy + oy, cx + ox),
                )
                den = jax.lax.dynamic_update_slice(
                    den,
                    jax.lax.dynamic_slice(den, (cy + oy, cx + ox), (p, p))
                    + wgts[i],
                    (cy + oy, cx + ox),
                )
                return num, den

            return jax.lax.fori_loop(0, k, inner, (num, den))

        num, den = jax.lax.fori_loop(0, n_ref, body, (num, den))
        out = jnp.where(den > 0, num / jnp.maximum(den, 1e-8), img)
        return out

    ht = stage(zp, zp, wiener=False)
    out = stage(zp, ht, wiener=True) if two_stage else ht
    return out[pad : pad + h, pad : pad + w]


def bm3d_rgb(z: jnp.ndarray, sigma: float, **kw) -> jnp.ndarray:
    """Per-channel BM3D of (C, H, W), like the reference's channel loop."""
    return jax.vmap(lambda ch: bm3d_denoise(ch, sigma, **kw))(z)


def bm3d_deblur(y: jnp.ndarray, kernel: jnp.ndarray, sigma: float,
                reg: float = 4e-3) -> jnp.ndarray:
    """BM3D-DEB (simplified): regularized inverse then BM3D.

    y: (B, C, H, W) blurred noisy measurement; kernel: PSF.
    """
    shape = y.shape[-2:]
    otf = psf_to_otf(kernel.astype(y.dtype), shape)
    yf = jnp.fft.rfft2(y, axes=(-2, -1))
    ri = jnp.conj(otf) / (jnp.abs(otf) ** 2 + reg)
    x_ri = jnp.fft.irfft2(ri * yf, s=shape, axes=(-2, -1))
    # effective noise amplification of the regularized inverse (traced-safe)
    amp = jnp.sqrt(jnp.mean(jnp.abs(ri) ** 2))
    sigma_eff = sigma * amp

    def per_image(img):
        return bm3d_rgb(img, sigma_eff)

    return jax.vmap(per_image)(jnp.clip(x_ri, -0.5, 1.5))


def bm3d_model(physics, *, sigma_psd: float):
    """Model-kind entry (ref src/models/bm3d_deblurring.py)."""
    assert physics.task == "deblurring", "BM3D baseline is for deblurring"

    def solve(y):
        return bm3d_deblur(y, physics.kernel, sigma_psd)

    return solve
