"""Golden parity tests: bicubic resize vs torch.nn.functional.interpolate.

The 0.05 dB acceptance budget (BASELINE.md) lives or dies on these kernels,
so we compare against torch CPU directly rather than stored fixtures.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sei_tpu.ops import resize, resize_np, resize_shorter_side_np
from sei_tpu.ops.kernels import get_kernel, kernel_names


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("antialias", [False, True])
@pytest.mark.parametrize(
    "in_hw,scale",
    [
        ((48, 48), 0.5),
        ((48, 48), 0.75),
        ((64, 48), 0.5),
        ((37, 53), 0.75),
        ((48, 48), 2.0),
        ((24, 32), 3.0),
        ((17, 23), 4.0),
    ],
)
def test_resize_scale_factor_matches_torch(in_hw, scale, antialias):
    if antialias and scale > 1.0:
        pytest.skip("torch antialias only affects downscaling")
    x = _rand((2, 3, *in_hw))
    want = F.interpolate(
        torch.from_numpy(x), scale_factor=scale, mode="bicubic", antialias=antialias
    ).numpy()
    got = np.asarray(resize(x, scale_factor=scale, antialias=antialias))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("antialias", [False, True])
@pytest.mark.parametrize("out_hw", [(128, 196), (100, 100), (256, 171)])
def test_resize_explicit_size_matches_torch(out_hw, antialias):
    x = _rand((1, 3, 200, 300), seed=1)
    want = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bicubic", antialias=antialias
    ).numpy()
    got = np.asarray(resize(x, size=out_hw, antialias=antialias))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_resize_np_matches_jax():
    x = _rand((3, 101, 77), seed=2)
    a = resize_np(x, size=(64, 64), antialias=True)
    b = np.asarray(resize(x, size=(64, 64), antialias=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_shorter_side_resize_shapes():
    # torchvision semantics: shorter side -> size, aspect preserved (trunc).
    x = _rand((3, 512, 768), seed=3)
    out = resize_shorter_side_np(x, 256)
    assert out.shape == (3, 256, 384)
    x = _rand((3, 768, 512), seed=4)
    out = resize_shorter_side_np(x, 256)
    assert out.shape == (3, 384, 256)


def test_kernels_match_reference_formulas():
    # Golden values recomputed with torch float64 (the reference formula).
    for name in kernel_names():
        k = get_kernel(name)
        assert abs(k.sum() - 1.0) < 1e-12
        if name.startswith("Gaussian"):
            r = int(name[-1])
            size = 6 * r + 1
            assert k.shape == (size, size)
            u = torch.arange(size, dtype=torch.float64) - (size - 1) / 2
            U, V = torch.meshgrid(u, u, indexing="ij")
            want = torch.exp(-(U**2 + V**2) / (2 * r**2))
            want = (want / want.sum()).numpy()
            np.testing.assert_allclose(k, want, atol=1e-12)
        else:
            r = int(name[-1])
            assert k.shape == (2 * r + 1, 2 * r + 1)
            np.testing.assert_allclose(k, 1.0 / (2 * r + 1) ** 2, atol=1e-12)
