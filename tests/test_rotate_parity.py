"""EI-rotate parity: sei_tpu.transforms.rotate_image vs torchvision semantics.

The reference's EI-rotate baseline consumes deepinv v0.2.0 ``Rotate``
(ref src/losses/__init__.py:86-94), which calls
``torchvision.transforms.functional.rotate(img, angle)`` — counter-clockwise
degrees, expand=False, fill=0, default center, default interpolation
(NEAREST).  torchvision itself is not installed here, so the oracle below
rebuilds only torchvision's documented affine-grid construction
(_get_inverse_affine_matrix with rot=-angle + _gen_affine_grid's centered
half-pixel base grid) and feeds it to torch's REAL ``F.grid_sample``
(align_corners=False, padding_mode="zeros") — the sampling kernel is
PyTorch's own, not a replica.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from sei_tpu.transforms import rotate_image


def torchvision_rotate_oracle(x: torch.Tensor, angle: float, mode: str):
    """torchvision F.rotate replica: hand-built grid + torch's grid_sample."""
    n, c, h, w = x.shape
    rot = np.radians(-angle)  # torchvision passes -angle for the inverse map
    # inverse matrix (scale=1, shear=0): [[cos, sin, 0], [-sin, cos, 0]]
    m = torch.tensor(
        [[np.cos(rot), np.sin(rot), 0.0], [-np.sin(rot), np.cos(rot), 0.0]],
        dtype=torch.float32,
    )
    # _gen_affine_grid: base grid in centered pixel coords with d=0.5,
    # rescaled by [0.5*w, 0.5*h] -> normalized align_corners=False coords
    d = 0.5
    bx = torch.linspace(-w * 0.5 + d, w * 0.5 + d - 1, w)
    by = torch.linspace(-h * 0.5 + d, h * 0.5 + d - 1, h)
    yy, xx = torch.meshgrid(by, bx, indexing="ij")
    ones = torch.ones_like(xx)
    base = torch.stack([xx, yy, ones], dim=-1)  # (h, w, 3)
    rescaled = m.T / torch.tensor([0.5 * w, 0.5 * h])
    grid = (base.reshape(-1, 3) @ rescaled).reshape(1, h, w, 2).expand(n, -1, -1, -1)
    return TF.grid_sample(
        x, grid, mode=mode, padding_mode="zeros", align_corners=False
    )


@pytest.mark.parametrize("mode", ["nearest", "bilinear"])
@pytest.mark.parametrize("hw", [(32, 32), (31, 33), (48, 48)])
@pytest.mark.parametrize("angle", [1.0, 17.0, 45.0, 90.0, 137.0, 270.0, 359.0])
def test_rotate_matches_torchvision_semantics(mode, hw, angle):
    h, w = hw
    rng = np.random.default_rng(3)
    x = rng.random((2, 3, h, w)).astype(np.float32)

    want = torchvision_rotate_oracle(torch.from_numpy(x), angle, mode).numpy()
    got = np.asarray(rotate_image(jnp.asarray(x), jnp.float32(angle), mode=mode))

    if mode == "nearest":
        # rounding ties sit on a measure-zero set; tolerate < 0.2% of pixels
        # differing (both implementations are valid nearest neighbours there)
        mismatch = np.abs(got - want) > 1e-5
        assert mismatch.mean() < 2e-3, f"{mismatch.mean():.4%} pixels differ"
    else:
        # pixel-space vs normalized-coord arithmetic: pure f32 rounding
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_random_rotate_angle_distribution():
    """deepinv samples uniform over the 359 NONZERO integer degrees."""
    import jax

    from sei_tpu.transforms import sample_rotate_angle

    keys = jax.random.split(jax.random.PRNGKey(0), 4096)
    angles = np.asarray(jax.vmap(sample_rotate_angle)(keys))
    assert angles.min() >= 1 and angles.max() <= 359  # zero excluded
    assert len(np.unique(angles)) > 300  # covers the group, roughly uniform
