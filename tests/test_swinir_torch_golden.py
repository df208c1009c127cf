"""flax SwinIR vs an independently written torch SwinIR (converted weights).

Catches layout/convention bugs (conv kernel order, window partition order,
shift masks, normalization, pixelshuffle channel order) that unit shape
tests cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sei_tpu.models.swinir import SwinIR

from .torch_swinir_ref import TorchSwinIR, load_flax_params


def _compare(flax_model, torch_model, shape, seed=0, atol=2e-4):
    rng = np.random.default_rng(seed)
    params = flax_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, shape[0], shape[1]))
    )["params"]
    # random-ish params (init gives zeros for some; perturb for a hard test)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(
            rng.standard_normal(v.shape).astype(np.float32) * 0.05
        ),
        params,
    )
    load_flax_params(torch_model, params)
    torch_model.eval()

    x = rng.random((2, 3, *shape)).astype(np.float32)
    got = np.asarray(flax_model.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


def test_swinir_denoise_head_matches_torch():
    cfg = dict(dim=12, depths=(2, 2), heads=(2, 2), ws=8, mlp_ratio=2.0)
    flax_m = SwinIR(embed_dim=12, depths=(2, 2), num_heads=(2, 2), window_size=8,
                    mlp_ratio=2.0, drop_path_rate=0.0, upsampler=None)
    torch_m = TorchSwinIR(**cfg, upscale=1, upsampler=None)
    _compare(flax_m, torch_m, (16, 16))


def test_swinir_shifted_windows_and_pad_match_torch():
    # 24x20 input: multiple windows (shift masks active) + reflect-pad path
    cfg = dict(dim=12, depths=(2, 2), heads=(2, 2), ws=8, mlp_ratio=2.0)
    flax_m = SwinIR(embed_dim=12, depths=(2, 2), num_heads=(2, 2), window_size=8,
                    mlp_ratio=2.0, drop_path_rate=0.0, upsampler=None)
    torch_m = TorchSwinIR(**cfg, upscale=1, upsampler=None)
    _compare(flax_m, torch_m, (24, 20), seed=1)


@pytest.mark.parametrize("upscale", [2, 3, 4])
def test_swinir_pixelshuffle_head_matches_torch(upscale):
    cfg = dict(dim=12, depths=(2,), heads=(2,), ws=8, mlp_ratio=2.0)
    flax_m = SwinIR(embed_dim=12, depths=(2,), num_heads=(2,), window_size=8,
                    mlp_ratio=2.0, drop_path_rate=0.0,
                    upsampler="pixelshuffle", upscale=upscale)
    torch_m = TorchSwinIR(**cfg, upscale=upscale, upsampler="pixelshuffle")
    _compare(flax_m, torch_m, (16, 16), seed=2)
