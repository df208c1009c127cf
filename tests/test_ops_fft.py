"""FFT blur / CT filter parity and adjointness tests."""

import numpy as np
import torch

from sei_tpu.ops import (
    blur_circular,
    blur_circular_adjoint,
    ct_like_filter,
    get_kernel,
    inverse_filter,
)


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


def _torch_circular_blur(x, kernel):
    """Independent golden: the BlurV2 recipe in torch (rfft2 OTF multiply)."""
    xt = torch.from_numpy(x)
    kt = torch.from_numpy(kernel).to(xt.dtype)
    h, w = x.shape[-2:]
    psf = torch.zeros((h, w), dtype=xt.dtype)
    psf[: kt.shape[-2], : kt.shape[-1]] = kt
    psf = psf.roll((-(kt.shape[-2] // 2), -(kt.shape[-1] // 2)), dims=(-2, -1))
    otf = torch.fft.rfft2(psf)
    yf = torch.fft.rfft2(xt) * otf
    return torch.fft.irfft2(yf, s=(h, w)).numpy()


def test_blur_matches_torch_fft_recipe():
    x = _rand((2, 3, 64, 48))
    for name in ["Gaussian_R2", "Box_R3"]:
        k = get_kernel(name, dtype=np.float32)
        got = np.asarray(blur_circular(x, k))
        want = _torch_circular_blur(x, k)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_blur_adjointness():
    # <A x, y> == <x, A^T y>
    k = get_kernel("Gaussian_R2", dtype=np.float32)
    x = _rand((1, 1, 40, 40), seed=1)
    y = _rand((1, 1, 40, 40), seed=2)
    ax = np.asarray(blur_circular(x, k))
    aty = np.asarray(blur_circular_adjoint(y, k))
    np.testing.assert_allclose((ax * y).sum(), (x * aty).sum(), rtol=1e-4)


def test_inverse_filter_inverts_blur():
    k = get_kernel("Gaussian_R1", dtype=np.float32)
    x = _rand((1, 3, 32, 32), seed=3)
    y = blur_circular(x, k)
    back = np.asarray(inverse_filter(y, k))
    np.testing.assert_allclose(back, x, atol=1e-3)


def test_ct_filter_dagger_is_exact_inverse():
    x = _rand((1, 3, 32, 32), seed=4)
    y = ct_like_filter(x, inverse=True)  # forward A
    back = np.asarray(ct_like_filter(y, inverse=False))  # A_dagger
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_ct_filter_matches_torch_recipe():
    x = _rand((1, 1, 16, 16), seed=5)
    xt = torch.from_numpy(x)

    def filt(v, dim, inverse):
        v = v.swapaxes(dim, -1)
        n = v.shape[-1]
        vf = torch.fft.rfft(v, dim=-1)
        otf = torch.arange(vf.shape[-1], dtype=v.dtype) + 1.0
        if inverse:
            otf = 1 / otf
        vf = vf * otf
        return torch.fft.irfft(vf, dim=-1, n=n).swapaxes(dim, -1)

    want = filt(filt(xt, 2, True), 3, True).numpy()
    got = np.asarray(ct_like_filter(x, inverse=True))
    np.testing.assert_allclose(got, want, atol=1e-5)
