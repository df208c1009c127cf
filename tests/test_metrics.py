"""Metric tests: YCbCr-Y PSNR/SSIM vs independent golden implementations."""

import numpy as np
import torch
import torch.nn.functional as F

from sei_tpu.metrics import psnr, psnr_y, quantize_and_clamp, register, rgb_to_y, ssim


def _img(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random(shape).astype(np.float32)


def test_psnr_matches_cv2():
    import cv2

    a = (_img((64, 64, 3), 0) * 255).astype(np.uint8)
    b = (_img((64, 64, 3), 1) * 255).astype(np.uint8)
    want = cv2.PSNR(a, b)  # data_range 255
    got = float(psnr(a.astype(np.float32), b.astype(np.float32), data_range=255.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rgb_to_y_golden():
    # kornia rgb_to_ycbcr Y = .299 R + .587 G + .114 B
    x = _img((3, 8, 8), 2)
    y = np.asarray(rgb_to_y(x))
    want = 0.299 * x[0] + 0.587 * x[1] + 0.114 * x[2]
    np.testing.assert_allclose(y, want, atol=1e-6)


def _torch_ssim_valid(a, b, data_range=1.0):
    """Independent golden: gaussian-window valid-conv SSIM in torch.

    This is the interior region torchmetrics computes after its
    reflect-pad + crop pipeline (see sei_tpu.metrics docstring).
    """
    k, sigma = 11, 1.5
    d = torch.arange(k, dtype=torch.float64) - (k - 1) / 2
    g = torch.exp(-((d / sigma) ** 2) / 2)
    g = (g / g.sum())
    win = (g[:, None] @ g[None, :]).reshape(1, 1, k, k)
    a = torch.from_numpy(a).double().reshape(1, 1, *a.shape)
    b = torch.from_numpy(b).double().reshape(1, 1, *b.shape)
    mu_a = F.conv2d(a, win)
    mu_b = F.conv2d(b, win)
    saa = F.conv2d(a * a, win) - mu_a**2
    sbb = F.conv2d(b * b, win) - mu_b**2
    sab = F.conv2d(a * b, win) - mu_a * mu_b
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    m = ((2 * mu_a * mu_b + c1) * (2 * sab + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (saa + sbb + c2)
    )
    return m.mean().item()


def test_ssim_matches_independent_golden():
    a = _img((48, 48), 3)
    b = np.clip(a + 0.05 * _img((48, 48), 4), 0, 1).astype(np.float32)
    want = _torch_ssim_valid(a, b)
    got = float(ssim(a, b))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ssim_identity_is_one():
    a = _img((32, 32), 5)
    assert abs(float(ssim(a, a)) - 1.0) < 1e-6


def test_register_center_crops_to_common():
    x = _img((3, 64, 70), 6)
    xh = _img((3, 60, 64), 7)
    a, b = register(x, xh)
    assert a.shape == (3, 60, 64) and b.shape == (3, 60, 64)
    np.testing.assert_allclose(np.asarray(a), x[:, 2:62, 3:67])


def test_quantize_and_clamp():
    x = np.array([[-0.2, 0.5004, 1.3]], dtype=np.float32)
    q = np.asarray(quantize_and_clamp(x))
    np.testing.assert_allclose(q, [[0.0, round(0.5004 * 255) / 255, 1.0]], atol=1e-7)


def test_psnr_y_on_batch_quantized_pipeline():
    # End-to-end metric path like demo/test.py: quantize then Y-PSNR.
    x = _img((3, 64, 64), 8)
    noisy = np.clip(x + 0.02 * _img((3, 64, 64), 9), 0, 1).astype(np.float32)
    p = float(psnr_y(quantize_and_clamp(noisy), quantize_and_clamp(x)))
    assert 25.0 < p < 50.0
