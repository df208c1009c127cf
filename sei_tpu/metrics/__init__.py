"""Evaluation metrics: Y-channel PSNR/SSIM (+ optional LPIPS).

Parity targets (ref src/metrics.py:10-46):
  * kornia ``rgb_to_ycbcr`` then channel 0 only;
  * torchmetrics ``peak_signal_noise_ratio(data_range=1.0)``;
  * torchmetrics ``structural_similarity_index_measure`` defaults
    (11x11 gaussian window, sigma 1.5, k1=0.01, k2=0.03, data_range=1.0);
    its reflect-pad-then-crop pipeline reduces to a *valid* gaussian-window
    SSIM map averaged over the interior, which is what we compute;
  * ``register``: center-crop both images to the common size.

LPIPS requires pretrained VGG/AlexNet features; with no network egress we
expose :func:`lpips_fn` as an optional hook that returns NaN unless a local
weights file is provided (the reference's headline numbers are PSNR/SSIM).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rgb_to_y(x: jnp.ndarray) -> jnp.ndarray:
    """Y channel of YCbCr (kornia convention), x: (..., 3, H, W) in [0,1]."""
    r = x[..., 0, :, :]
    g = x[..., 1, :, :]
    b = x[..., 2, :, :]
    return 0.299 * r + 0.587 * g + 0.114 * b


def psnr(x_hat: jnp.ndarray, x: jnp.ndarray, *, data_range: float = 1.0) -> jnp.ndarray:
    """PSNR over all elements (torchmetrics convention)."""
    mse = jnp.mean((x_hat - x) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse)


def psnr_y(x_hat: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Y-channel PSNR (ref psnr_fn)."""
    return psnr(rgb_to_y(x_hat), rgb_to_y(x))


def _gaussian_window(size: int = 11, sigma: float = 1.5, dtype=jnp.float32) -> jnp.ndarray:
    dist = np.arange(start=(1 - size) / 2, stop=(1 + size) / 2, step=1, dtype=np.float64)
    g = np.exp(-((dist / sigma) ** 2) / 2)
    g = g / g.sum()
    return jnp.asarray(g, dtype=dtype)


def _sep_valid(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Valid separable filtering along the last two axes via matmul."""
    k = win.shape[0]
    h, w = img.shape[-2], img.shape[-1]
    # build (h-k+1, h) and (w-k+1, w) banded matrices; constant-folded in jit
    def band(n):
        m = np.zeros((n - k + 1, n), dtype=np.float64)
        for i in range(n - k + 1):
            m[i, i : i + k] = np.asarray(win, dtype=np.float64)
        return jnp.asarray(m, dtype=img.dtype)

    bh = band(h)
    bw = band(w)
    # HIGHEST precision: TPU f32 matmuls default to bf16 mantissas, whose
    # ~1e-3 error is the same scale as c2 - the variance cancellation
    # (mu_xx - mu_x^2) then goes negative on flat regions and SSIM explodes
    # past 1 (observed: per-image SSIM 31.7 on a flat dead-leaves val image).
    return jnp.einsum("oh,...hw,pw->...op", bh, img, bw,
                      precision=jax.lax.Precision.HIGHEST)


def ssim(
    x_hat: jnp.ndarray,
    x: jnp.ndarray,
    *,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """SSIM with a gaussian window (torchmetrics-default semantics).

    Input: (..., H, W) single-channel or multi-channel leading axes; the map
    is the interior valid region, averaged.
    """
    win = _gaussian_window(kernel_size, sigma, dtype=x.dtype)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _sep_valid(x_hat, win)
    mu_y = _sep_valid(x, win)
    mu_xx = _sep_valid(x_hat * x_hat, win)
    mu_yy = _sep_valid(x * x, win)
    mu_xy = _sep_valid(x_hat * x, win)
    sx = mu_xx - mu_x * mu_x
    sy = mu_yy - mu_y * mu_y
    sxy = mu_xy - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sx + sy + c2)
    return jnp.mean(num / den)


def ssim_y(x_hat: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Y-channel SSIM (ref ssim_fn)."""
    return ssim(rgb_to_y(x_hat), rgb_to_y(x))


def register(x: jnp.ndarray, x_hat: jnp.ndarray):
    """Center-crop both to the common size (ref register_fn)."""
    hmin = min(x.shape[-2], x_hat.shape[-2])
    wmin = min(x.shape[-1], x_hat.shape[-1])

    def cc(t):
        top = (t.shape[-2] - hmin) // 2
        left = (t.shape[-1] - wmin) // 2
        return t[..., top : top + hmin, left : left + wmin]

    return cc(x), cc(x_hat)


def quantize_and_clamp(im: jnp.ndarray) -> jnp.ndarray:
    """8-bit quantize then clamp to [0,1] (ref demo/test.py:139-148)."""
    im = jnp.round(im * 255.0) / 255.0
    return jnp.clip(im, 0.0, 1.0)


_LPIPS = None


def set_lpips_weights(weights_path: str):
    """Enable LPIPS for subsequent compute_metrics calls (local weights)."""
    global _LPIPS
    from .lpips import LPIPS  # lazy; needs local AlexNet+head weights

    _LPIPS = LPIPS(weights_path)


def lpips_fn(x_hat, x, weights_path: str | None = None):
    """Optional LPIPS; returns NaN without local pretrained weights."""
    if _LPIPS is None and weights_path is not None:
        set_lpips_weights(weights_path)
    if _LPIPS is None:
        return float("nan")
    return _LPIPS(x_hat, x)


def compute_metrics(x: jnp.ndarray, x_hat: jnp.ndarray):
    """(psnr, ssim, lpips) on registered images (ref compute_metrics)."""
    x, x_hat = register(x, x_hat)
    p = float(psnr_y(x, x_hat))
    s = float(ssim_y(x, x_hat))
    l = lpips_fn(x_hat, x)
    l = float(l) if not isinstance(l, float) else l
    return p, s, l
