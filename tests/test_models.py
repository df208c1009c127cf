"""Model construction, forward shapes, param counts, torch interop round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sei_tpu.models import Model, get_model, swinir_config
from sei_tpu.models.torch_io import flax_swinir_to_torch, torch_swinir_to_flax
from sei_tpu.physics import get_physics


def _nparams(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def swinir_deblur():
    return get_model(kind="Proposed", architecture="Transformer", task="deblurring",
                     init_input_size=16)


def test_swinir_param_count(swinir_deblur):
    # deepinv SwinIR @ embed 180, depths [6]*6, no upsampler: ~11.5M params.
    n = _nparams(swinir_deblur.params)
    assert 11.0e6 < n < 12.5e6, n


def test_swinir_forward_shape_and_residual(swinir_deblur):
    y = jnp.ones((1, 3, 16, 16)) * 0.5
    out = swinir_deblur(y)
    assert out.shape == (1, 3, 16, 16)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_swinir_nonwindow_multiple_input(swinir_deblur):
    # 20 is not a multiple of window 8: exercises reflect pad + crop.
    y = jnp.ones((1, 3, 20, 20)) * 0.3
    out = swinir_deblur(y)
    assert out.shape == (1, 3, 20, 20)


def test_swinir_sr_pixelshuffle_shape():
    # shape contract of the pixelshuffle head — a small config exercises the
    # same head code in a fraction of the flagship's compile time
    m = get_model(kind="Proposed", architecture="Transformer", task="sr",
                  sr_factor=2, init_input_size=16,
                  swinir_overrides={"embed_dim": 24, "depths": (2, 2),
                                    "num_heads": (2, 2)})
    y = jnp.ones((1, 3, 16, 16)) * 0.5
    out = m(y)
    assert out.shape == (1, 3, 32, 32)


def test_swinir_torch_roundtrip(swinir_deblur):
    sd = flax_swinir_to_torch(swinir_deblur.params)
    # every key looks like a torch SwinIR key
    assert any(k.startswith("layers.0.residual_group.blocks.0.attn.qkv") for k in sd)
    assert "conv_first.weight" in sd and "norm.weight" in sd
    back = torch_swinir_to_flax(sd)
    flat_a = jax.tree_util.tree_leaves(swinir_deblur.params)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_swinir_load_torch_statedict(swinir_deblur):
    sd = flax_swinir_to_torch(swinir_deblur.params)
    sd = {k: v + 1.0 for k, v in sd.items()}
    # reuse the module fixture instead of initializing a second flagship
    # model (saves ~12 s); params are restored for later fixture users
    orig = swinir_deblur.params
    try:
        swinir_deblur.load_weights(sd)
        a = jax.tree_util.tree_leaves(swinir_deblur.params)
        b = jax.tree_util.tree_leaves(orig)
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y) + 1.0, atol=1e-6
            )
    finally:
        swinir_deblur.params = orig


# small blueprint: the default 5-scale spectral UNet costs ~250s of CPU
# compile per shape; 3 scales exercises every code path (ideal up/down,
# skips, reflect pad) at a fraction of the graph size
_SMALL_CONV = {"scales": 3, "hidden_channels": 8, "num_conv_blocks": 1}


def test_convolutional_model_shapes():
    m = get_model(kind="Proposed", architecture="Convolutional", task="deblurring",
                  init_input_size=16, conv_blueprint=_SMALL_CONV)
    # non multiple of 2^(scales-1)=4: exercises the reflect pad path (and,
    # as one apply, batch>1 + shape preservation - one compile, not two)
    y = jnp.ones((2, 3, 18, 14)) * 0.5
    assert m(y).shape == (2, 3, 18, 14)


def test_convolutional_sr():
    m = get_model(kind="Proposed", architecture="Convolutional", task="sr",
                  sr_factor=2, init_input_size=16, conv_blueprint=_SMALL_CONV)
    y = jnp.ones((1, 3, 16, 16)) * 0.5
    assert m(y).shape == (1, 3, 32, 32)


def test_baseline_models():
    phys = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    y = jnp.ones((1, 3, 32, 32)) * 0.5
    ident = get_model(kind="Identity", task="deblurring", physics=phys)
    assert jnp.allclose(ident(y), y)
    inv = get_model(kind="InverseFilter", task="deblurring", physics=phys)
    x = inv(phys.A(y))
    np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-3)

    phys_sr = get_physics(task="sr", sr_factor=2, noise_level=5)
    up = get_model(kind="Upsample", task="sr", sr_factor=2, physics=phys_sr)
    assert up(jnp.ones((1, 3, 16, 16))).shape == (1, 3, 32, 32)


def test_model_kind_aliases():
    phys = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    m = get_model(kind="id", task="deblurring", physics=phys)
    assert m.kind == "Identity"


def test_swinir_droppath_training_mode(swinir_deblur):
    y = jnp.ones((2, 3, 16, 16)) * 0.5
    rng = jax.random.PRNGKey(3)
    out = swinir_deblur.apply_fn(swinir_deblur.params, y, train=True, rng=rng)
    assert out.shape == y.shape and bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow  # opt-in nn.scan variant (default off)
def test_swinir_scan_blocks_equals_loop():
    from sei_tpu.models.swinir import SwinIR, stack_params_for_scan

    loop = SwinIR(embed_dim=12, depths=(2, 4), num_heads=(2, 2), window_size=8,
                  drop_path_rate=0.0, upsampler=None)
    scan = SwinIR(embed_dim=12, depths=(2, 4), num_heads=(2, 2), window_size=8,
                  drop_path_rate=0.0, upsampler=None, scan_blocks=True)
    x = jnp.asarray(np.random.default_rng(0).random((1, 3, 16, 16), dtype=np.float32))
    p_loop = loop.init(jax.random.PRNGKey(0), x)["params"]
    p_scan = stack_params_for_scan(p_loop)
    out_loop = loop.apply({"params": p_loop}, x)
    out_scan = scan.apply({"params": p_scan}, x)
    np.testing.assert_allclose(
        np.asarray(out_loop), np.asarray(out_scan), atol=1e-5
    )
