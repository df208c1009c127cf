"""Bicubic resampling weights with PyTorch-parity semantics.

The reference framework relies on three distinct torch resamplers
(ref: src/physics/downsampling/__init__.py:16-19, src/transforms.py:46-83,
src/datasets/ground_truth.py:75-81):

  * ``torch.nn.functional.interpolate(mode="bicubic", antialias=False)``
  * ``torch.nn.functional.interpolate(mode="bicubic", antialias=True)``
  * ``torchvision.transforms.functional.resize`` (same as the antialiased
    interpolate, shorter-side semantics)

None of these match ``jax.image.resize``; metric parity lives or dies on the
exact kernel/coordinate conventions.  TPU-first design: a 1-D resample along an
axis is a dense (out_size, in_size) weight matrix, so a 2-D bicubic resize is
two MXU matmuls.  For static shapes the matrices are built **in numpy at trace
time** and constant-folded into the jitted graph.

Conventions implemented (verified against torch 2.x CPU in tests):

  * non-antialiased: source coord ``src = (dst + 0.5) * scale - 0.5`` (half
    pixel, align_corners=False), 4 taps at ``floor(src)-1 .. floor(src)+2``,
    cubic convolution weights with A = -0.75, taps clamped to the valid range.
  * antialiased: the separable Pillow-style algorithm of ATen
    ``upsample_bicubic2d_aa``: ``center = scale*(i+0.5)``; support 2*scale for
    scale>1 else 2; taps ``j in [floor(center-support+0.5),
    ceil?min(in, int(center+support+0.5)))``; weights
    ``cubic((j - center + 0.5) * invscale)`` normalized to sum 1.
"""

from __future__ import annotations

import numpy as np

_A = -0.75  # torch's cubic convolution constant


def _cubic1(x: np.ndarray, a: float = _A) -> np.ndarray:
    # |x| <= 1 branch of the cubic convolution kernel
    return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0


def _cubic2(x: np.ndarray, a: float = _A) -> np.ndarray:
    # 1 < |x| < 2 branch
    return (((x - 5.0) * x + 8.0) * x - 4.0) * a


def cubic_kernel(x: np.ndarray, a: float = _A) -> np.ndarray:
    """Cubic convolution kernel (Keys), vectorized, matches torch A=-0.75."""
    x = np.abs(x)
    return np.where(
        x < 1.0, _cubic1(x, a), np.where(x < 2.0, _cubic2(x, a), 0.0)
    )


def cubic_weights_from_frac(t):
    """The 4 tap weights for fractional offset ``t`` in [0,1).

    Taps are at offsets (-1, 0, 1, 2) from floor(src).  Works for numpy or
    jax.numpy arrays (pure arithmetic).  Matches torch
    ``get_cubic_upsample_coefficients``.
    """
    a = _A
    # distance of each tap from the sample point: t+1, t, 1-t, 2-t
    x1 = t + 1.0
    w0 = (((x1 - 5.0) * x1 + 8.0) * x1 - 4.0) * a
    w1 = ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0
    t2 = 1.0 - t
    w2 = ((a + 2.0) * t2 - (a + 3.0)) * t2 * t2 + 1.0
    x2 = t2 + 1.0
    w3 = (((x2 - 5.0) * x2 + 8.0) * x2 - 4.0) * a
    return w0, w1, w2, w3


def resize_matrix(
    in_size: int,
    out_size: int,
    *,
    antialias: bool,
    scale: float | None = None,
    dtype=np.float32,
) -> np.ndarray:
    """Dense (out_size, in_size) bicubic resampling matrix, torch semantics.

    ``scale`` is the source-step per output pixel (in_size/out_size when
    resizing to an explicit size; ``1/scale_factor`` when torch was called
    with a scale_factor).  The two coincide whenever
    ``out_size == floor(in_size * scale_factor)`` exactly.
    """
    if scale is None:
        scale = in_size / out_size
    W = np.zeros((out_size, in_size), dtype=np.float64)
    if not antialias:
        # torch computes source positions/weights in the input dtype
        # (float32); mirror that so parity holds to ~1e-7.
        i = np.arange(out_size, dtype=np.float32)
        src = (i + np.float32(0.5)) * np.float32(scale) - np.float32(0.5)
        fl = np.floor(src)
        t = (src - fl).astype(np.float32)
        ws = np.stack(cubic_weights_from_frac(t), axis=0)  # (4, out)
        for tap in range(4):
            idx = np.clip(fl.astype(np.int64) - 1 + tap, 0, in_size - 1)
            np.add.at(W, (np.arange(out_size), idx), ws[tap])
    else:
        # The antialiased path is the Pillow-derived separable resampler;
        # note it uses the Pillow cubic constant a=-0.5, unlike the
        # non-antialiased kernel's a=-0.75.
        i = np.arange(out_size, dtype=np.float64)
        support = 2.0 * scale if scale >= 1.0 else 2.0
        invscale = 1.0 / scale if scale >= 1.0 else 1.0
        center = scale * (i + 0.5)
        xmin = np.maximum(center - support + 0.5, 0.0).astype(np.int64)
        xmax = np.minimum(center + support + 0.5, float(in_size)).astype(np.int64)
        max_taps = int((xmax - xmin).max()) if out_size else 0
        for tap in range(max_taps):
            j = xmin + tap
            valid = j < xmax
            w = cubic_kernel((j - center + 0.5) * invscale, a=-0.5)
            w = np.where(valid, w, 0.0)
            np.add.at(W, (np.arange(out_size), np.clip(j, 0, in_size - 1)), w)
        W /= np.maximum(W.sum(axis=1, keepdims=True), 1e-30)
    return W.astype(dtype)


def output_size_for_scale(in_size: int, scale_factor: float) -> int:
    """torch output size for interpolate(scale_factor=...)."""
    return int(np.floor(in_size * scale_factor))


def shorter_side_sizes(h: int, w: int, size: int) -> tuple[int, int]:
    """torchvision ``resize(size=int)`` output size (shorter side -> size).

    Matches torchvision._compute_resized_output_size: the short side becomes
    ``size`` and the long side is scaled by the same ratio, truncated to int.
    """
    if h <= w:
        new_h = size
        new_w = int(size * w / h)
    else:
        new_w = size
        new_h = int(size * h / w)
    return new_h, new_w
