"""DRUNet architecture + solver shape/finiteness tests (random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sei_tpu.models.denoiser_solvers import dpir_hqs, make_data_prox
from sei_tpu.models.drunet import DRUNet, torch_drunet_to_flax
from sei_tpu.physics import get_physics


@pytest.fixture(scope="module")
def drunet():
    net = DRUNet(channels=(8, 16, 32, 64), nb=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16)), 0.1)[
        "params"
    ]
    return net, params


def test_drunet_shapes(drunet):
    net, params = drunet
    x = jnp.ones((2, 3, 33, 41)) * 0.5  # odd sizes exercise pad-to-8
    out = net.apply({"params": params}, x, 0.05)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_torch_drunet_key_mapping():
    """Build a synthetic torch-style state dict and verify full mapping."""
    chans = [64, 128, 256, 512]
    nb = 4
    sd = {}
    sd["m_head.weight"] = np.zeros((64, 4, 3, 3), np.float32)
    for i in range(3):
        for j in range(nb):
            sd[f"m_down{i}.{j}.res.0.weight"] = np.zeros(
                (chans[i], chans[i], 3, 3), np.float32
            )
            sd[f"m_down{i}.{j}.res.2.weight"] = np.zeros(
                (chans[i], chans[i], 3, 3), np.float32
            )
        sd[f"m_down{i}.{nb}.weight"] = np.zeros(
            (chans[i + 1], chans[i], 2, 2), np.float32
        )
    for j in range(nb):
        sd[f"m_body.{j}.res.0.weight"] = np.zeros((512, 512, 3, 3), np.float32)
        sd[f"m_body.{j}.res.2.weight"] = np.zeros((512, 512, 3, 3), np.float32)
    for i in range(3):
        sd[f"m_up{i}.0.weight"] = np.zeros(
            (chans[i + 1], chans[i], 2, 2), np.float32
        )
        for j in range(nb):
            sd[f"m_up{i}.{j + 1}.res.0.weight"] = np.zeros(
                (chans[i], chans[i], 3, 3), np.float32
            )
            sd[f"m_up{i}.{j + 1}.res.2.weight"] = np.zeros(
                (chans[i], chans[i], 3, 3), np.float32
            )
    sd["m_tail.weight"] = np.zeros((3, 64, 3, 3), np.float32)

    params = torch_drunet_to_flax(sd)
    net = DRUNet()
    want = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16)), 0.1)["params"]
    got_paths = {
        tuple(p.key for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    want_paths = {
        tuple(p.key for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(want)[0]
    }
    assert got_paths == want_paths
    # shapes line up too
    flat_w = dict(
        (tuple(p.key for p in path), v.shape)
        for path, v in jax.tree_util.tree_flatten_with_path(want)[0]
    )
    for path, v in jax.tree_util.tree_flatten_with_path(params)[0]:
        assert flat_w[tuple(p.key for p in path)] == v.shape


def test_dpir_prox_closed_form_matches_cg():
    phys = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 3, 32, 32), dtype=np.float32))
    y = phys.A(x)
    prox = make_data_prox(phys)
    from sei_tpu.models.denoiser_solvers import _prox_l2_cg

    a = prox(x * 0.5, y, 0.7)
    b = _prox_l2_cg(x * 0.5, y, phys, 0.7, iters=60)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_dps_oracle_denoiser_recovers_clean():
    """DPS range-convention check (ref src/models/dps.py:9-21 via deepinv).

    With an oracle denoiser that always returns the clean image, the x0
    estimate is exact at every step, so the sampler must converge to the
    clean image in [0,1] output space.  Catches any mistake in the
    [-1,1] <-> [0,1] bridging or the final rescale.
    """
    from sei_tpu.models.denoiser_solvers import dps

    phys = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    rng = np.random.default_rng(2)
    clean = jnp.asarray(rng.random((1, 3, 16, 16), dtype=np.float32))
    y = phys.degrade(clean, jax.random.PRNGKey(0))

    def oracle(z, s):
        return jnp.broadcast_to(clean, z.shape)

    out = dps(y, phys, oracle, steps=10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(clean), atol=1e-3)


def test_diffpir_oracle_denoiser_recovers_clean():
    from sei_tpu.models.denoiser_solvers import diffpir

    phys = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    rng = np.random.default_rng(3)
    clean = jnp.asarray(rng.random((1, 3, 16, 16), dtype=np.float32))
    y = phys.degrade(clean, jax.random.PRNGKey(0))

    def oracle(z, s):
        return jnp.broadcast_to(clean, z.shape)

    out = diffpir(y, phys, oracle, noise_level_img=5 / 255.0, steps=10)
    # the data prox pulls x0 toward the (noisy) measurement-consistent
    # solution, so tolerance is loose; this is a stability/range check
    assert float(jnp.mean(jnp.abs(out - clean))) < 0.1


def test_dpir_hqs_with_tiny_denoiser(drunet):
    net, params = drunet
    phys = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 3, 32, 32), dtype=np.float32))
    y = phys.degrade(x, jax.random.PRNGKey(0))

    def denoiser(z, s):
        return net.apply({"params": params}, z, s)

    out = dpir_hqs(y, phys, denoiser, noise_level_img=5 / 255.0, iters=3)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))
