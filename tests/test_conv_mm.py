"""im2col-matmul conv vs XLA native conv (ops/conv_mm.py).

The mm lowering must be numerically interchangeable with lax.conv (and
therefore with torch Conv2d(3x3, padding=1), which test_swinir_torch_golden
already pins for the model) in both forward and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sei_tpu.ops.conv_mm import Conv3x3, _conv3x3_lax, conv3x3_mm


@pytest.mark.parametrize("shape,cout", [((2, 8, 8, 5), 7), ((1, 12, 9, 16), 16)])
def test_conv3x3_mm_matches_lax(shape, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, shape[-1], cout)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    y_mm = conv3x3_mm(x, w, b)
    y_lax = _conv3x3_lax(x, w, b)
    np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_lax), rtol=1e-5, atol=1e-5)


def test_conv3x3_mm_grads_match_lax():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 5)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((5,)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((2, 6, 6, 5)), jnp.float32)

    def loss(fn, x, w, b):
        return jnp.sum(fn(x, w, b) * cot)

    g_mm = jax.grad(lambda *a: loss(conv3x3_mm, *a), argnums=(0, 1, 2))(x, w, b)
    g_lax = jax.grad(lambda *a: loss(_conv3x3_lax, *a), argnums=(0, 1, 2))(x, w, b)
    for a, e in zip(g_mm, g_lax):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=1e-5, atol=1e-5)


def test_conv3x3_module_both_lowerings_agree():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 10, 10, 6)), jnp.float32)
    mod_mm = Conv3x3(8, use_mm=True)
    mod_lax = Conv3x3(8, use_mm=False)
    params = mod_mm.init(jax.random.PRNGKey(0), x)
    y_mm = mod_mm.apply(params, x)
    y_lax = mod_lax.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_lax), rtol=1e-5, atol=1e-5)
    # param layout identical to nn.Conv (checkpoint compatibility)
    import flax.linen as nn

    ref = nn.Conv(8, (3, 3), padding="SAME").init(jax.random.PRNGKey(0), x)
    assert jax.tree.map(jnp.shape, params) == jax.tree.map(jnp.shape, ref)


def test_swinir_forward_same_with_mm_convs(monkeypatch):
    from sei_tpu.models.swinir import SwinIR

    model = SwinIR(img_size=16, embed_dim=24, depths=(2,), num_heads=(2,),
                   window_size=8, drop_path_rate=0.0, fused_trunk=False)
    x = jnp.asarray(np.random.default_rng(3).random((1, 3, 16, 16)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, True)
    monkeypatch.setenv("SEI_CONV_MM", "0")
    y0 = model.apply(params, x, True)
    monkeypatch.setenv("SEI_CONV_MM", "1")
    y1 = model.apply(params, x, True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,cout", [((2, 8, 8, 5), 7), ((1, 12, 9, 16), 16)])
def test_conv3x3_taps_matches_lax(shape, cout):
    from sei_tpu.ops.conv_mm import conv3x3_taps

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, shape[-1], cout)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv3x3_taps(x, w, b)),
        np.asarray(_conv3x3_lax(x, w, b)),
        rtol=1e-5, atol=1e-5,
    )


def test_conv3x3_taps_grads_match_lax():
    from sei_tpu.ops.conv_mm import conv3x3_taps

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 5)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((5,)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((2, 6, 6, 5)), jnp.float32)

    def loss(fn, x, w, b):
        return jnp.sum(fn(x, w, b) * cot)

    g_t = jax.grad(lambda *a: loss(conv3x3_taps, *a), argnums=(0, 1, 2))(x, w, b)
    g_l = jax.grad(lambda *a: loss(_conv3x3_lax, *a), argnums=(0, 1, 2))(x, w, b)
    for a, e in zip(g_t, g_l):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=1e-5, atol=1e-5)


def test_conv3x3_module_taps_env(monkeypatch):
    monkeypatch.setenv("SEI_CONV_TAPS", "1")
    monkeypatch.delenv("SEI_CONV_MM", raising=False)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 6)), jnp.float32)
    m = Conv3x3(features=9)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    w = params["params"]["kernel"]
    b = params["params"]["bias"]
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_conv3x3_lax(x, w, b)), rtol=1e-5, atol=1e-5
    )


def test_conv3x3_hybrid_matches_lax_fwd_and_grads():
    """Hybrid lowering (taps fwd + native-transpose bwd) == native conv."""
    from sei_tpu.ops.conv_mm import conv3x3_hybrid

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 5)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((5,)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((2, 6, 6, 5)), jnp.float32)

    np.testing.assert_allclose(
        np.asarray(conv3x3_hybrid(x, w, b)),
        np.asarray(_conv3x3_lax(x, w, b)),
        rtol=1e-5, atol=1e-5,
    )

    def loss(fn, x, w, b):
        return jnp.sum(fn(x, w, b) * cot)

    g_h = jax.grad(lambda *a: loss(conv3x3_hybrid, *a), argnums=(0, 1, 2))(x, w, b)
    g_l = jax.grad(lambda *a: loss(_conv3x3_lax, *a), argnums=(0, 1, 2))(x, w, b)
    for a, e in zip(g_h, g_l):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=1e-5, atol=1e-5)


def test_conv3x3_hybrid_bf16_params_f32():
    """bf16 activations with f32 params: grads flow back as f32 leaves."""
    from sei_tpu.ops.conv_mm import conv3x3_hybrid

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((4,)), jnp.float32)

    def loss(fn, w):
        return jnp.sum(fn(x, w.astype(x.dtype), b).astype(jnp.float32) ** 2)

    g_h = jax.grad(lambda w: loss(conv3x3_hybrid, w))(w)
    g_l = jax.grad(lambda w: loss(_conv3x3_lax, w))(w)
    assert g_h.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(g_h), np.asarray(g_l), rtol=2e-2, atol=2e-2)


def test_conv3x3_module_hybrid_env(monkeypatch):
    monkeypatch.setenv("SEI_CONV_HYBRID", "1")
    monkeypatch.delenv("SEI_CONV_TAPS", raising=False)
    monkeypatch.delenv("SEI_CONV_MM", raising=False)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 6)), jnp.float32)
    m = Conv3x3(features=9)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    w = params["params"]["kernel"]
    b = params["params"]["bias"]
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_conv3x3_lax(x, w, b)), rtol=1e-5, atol=1e-5
    )
