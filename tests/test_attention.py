"""Pallas fused window attention vs the XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sei_tpu.ops.attention import window_attention


def _inputs(b_=24, nh=6, n=64, hd=30, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b_, nh, n, hd)).astype(np.float32)) * 0.18
    k = jnp.asarray(rng.standard_normal((b_, nh, n, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b_, nh, n, hd)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((nh, n, n)).astype(np.float32)) * 0.1
    mask = np.where(rng.random((12, n, n)) > 0.8, -100.0, 0.0).astype(np.float32)
    return q, k, v, bias, mask


@pytest.mark.parametrize("masked", [False, True])
def test_pallas_forward_matches_xla(masked):
    q, k, v, bias, mask = _inputs()
    m = mask if masked else None
    a = window_attention(q, k, v, bias, m, use_pallas=False)
    b = window_attention(q, k, v, bias, m, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pallas_vjp_matches_xla():
    q, k, v, bias, mask = _inputs(seed=1)

    def loss(q, k, v, bias, up):
        o = window_attention(q, k, v, bias, mask, use_pallas=up, interpret=up)
        return jnp.sum(o * o)

    gx = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias, False)
    gp = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias, True)
    for a, b in zip(gx, gp):
        scale = float(jnp.abs(a).max()) + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=3e-6
        )


def test_pallas_handles_nondividing_batch():
    # B_ = 7 windows: group picker must fall back to G=1
    q, k, v, bias, _ = _inputs(b_=7)
    a = window_attention(q, k, v, bias, None, use_pallas=False)
    b = window_attention(q, k, v, bias, None, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
