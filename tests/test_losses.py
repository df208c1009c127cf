"""Loss semantics tests: SURE golden values, EI structure, R2R, dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from sei_tpu.losses import LossConfig, compute_sure_margin, get_loss
from sei_tpu.losses.sure import sure_gaussian_loss
from sei_tpu.losses.weights_distance import weights_distance_loss
from sei_tpu.physics import get_physics


def _A_identity(x):
    return x


def test_sure_golden_value_zero_tau_limit():
    """With a LINEAR model f(y)=a*y and A=I, SURE has a closed form:

    E_b[div] -> a (exactly, for linear f, any b), so
    loss = mean((a*y - y)^2) + 2 sigma^2 * a - sigma^2 / B.
    """
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((4, 3, 16, 16)).astype(np.float32))
    a = 0.7
    sigma = 5 / 255.0
    model = lambda t: a * t
    key = jax.random.PRNGKey(0)
    got = float(
        sure_gaussian_loss(
            key, y, model(y), model, _A_identity, sigma=sigma, tau=1e-2
        )
    )
    want = float(jnp.mean((a * y - y) ** 2)) + 2 * sigma**2 * a - sigma**2 / 4
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_sure_margin_crops_boundary():
    """Margin: probe is zero outside the inner window; mse ignores borders."""
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((2, 3, 16, 16)).astype(np.float32))
    # model that corrupts ONLY the border: margin-SURE must not see it
    def model(t):
        border = jnp.ones_like(t).at[..., 3:-3, 3:-3].set(0.0)
        return t + 100.0 * border

    key = jax.random.PRNGKey(1)
    loss_m = float(
        sure_gaussian_loss(
            key, y, model(y), model, _A_identity,
            sigma=5 / 255.0, margin=3, cropped_div=True,
        )
    )
    ident = lambda t: t
    loss_id = float(
        sure_gaussian_loss(
            key, y, ident(y), ident, _A_identity,
            sigma=5 / 255.0, margin=3, cropped_div=True,
        )
    )
    np.testing.assert_allclose(loss_m, loss_id, atol=1e-5)


def test_sure_margin_formula_matches_torch_reference():
    """Replicate the reference mc_div + SureGaussianLoss numerics in torch
    with a FIXED probe and compare (formula parity, not RNG parity)."""
    rng = np.random.default_rng(2)
    y_np = rng.standard_normal((2, 1, 12, 12)).astype(np.float32)
    b_np = rng.standard_normal((2, 1, 12, 12)).astype(np.float32)
    margin = 2
    b_np[..., :margin, :] = 0
    b_np[..., -margin:, :] = 0
    b_np[..., :, :margin] = 0
    b_np[..., :, -margin:] = 0
    sigma, tau = 5 / 255.0, 1e-2
    a = 0.9

    # torch golden, following the published formula
    yt = torch.from_numpy(y_np)
    bt = torch.from_numpy(b_np)
    y1 = a * yt
    y2 = a * (yt + bt * tau)
    div = (bt * (y2 - y1) / tau)[:, :, margin:-margin, margin:-margin].mean()
    mse = (y1 - yt)[:, :, margin:-margin, margin:-margin].pow(2).mean()
    want = float(mse + 2 * sigma**2 * div - sigma**2 / 2)

    # ours with the same fixed probe (monkeypatch the normal draw)
    from sei_tpu.losses import sure as sure_mod

    y = jnp.asarray(y_np)
    orig = jax.random.normal
    try:
        jax.random.normal = lambda key, shape, dtype=None: jnp.asarray(
            rng_fixed(shape)
        )

        def rng_fixed(shape):
            # inner-window shape: the module draws then masks; emulate by
            # drawing the full b and relying on its masking
            return b_np

        got = float(
            sure_gaussian_loss(
                jax.random.PRNGKey(0), y, a * y, lambda t: a * t, _A_identity,
                sigma=sigma, tau=tau, margin=margin, cropped_div=True,
            )
        )
    finally:
        jax.random.normal = orig
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_compute_sure_margin_rules():
    assert compute_sure_margin(partial_sure=False, sure_margin=None, task="deblurring") == 0
    assert (
        compute_sure_margin(
            partial_sure=True, sure_margin=None, task="deblurring",
            kernel_shape=(13, 13),
        )
        == 6
    )
    assert compute_sure_margin(partial_sure=True, sure_margin=None, task="sr") == 0
    assert (
        compute_sure_margin(
            partial_sure=True, sure_margin=None, task="sr", partial_sure_sr=True
        )
        == 2
    )
    assert compute_sure_margin(partial_sure=True, sure_margin=4, task="sr") == 4


def test_proposed_loss_stop_gradient_blocks_transform_branch():
    """With stop_gradient, d(loss)/d(params) through T(x1) must not flow
    via x2; verify by comparing to an explicitly detached computation."""
    phys = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 3, 48, 48), dtype=np.float32))
    key = jax.random.PRNGKey(0)
    y = phys.randomly_degrade(x, key, seed=0)

    w0 = jnp.asarray(0.8)

    def model_of(w):
        return lambda t: w * t

    # jitted so the persistent compile cache absorbs the op-by-op dispatch
    # cost on the 1-core box (VERDICT item 8)
    loss_t = get_loss(method="proposed", physics=phys, stop_gradient=True,
                      crop_training_pairs=False)
    loss_f = get_loss(method="proposed", physics=phys, stop_gradient=False,
                      crop_training_pairs=False)
    gt = float(jax.jit(jax.grad(lambda w: loss_t(key, x, y, model_of(w))))(w0))
    gf = float(jax.jit(jax.grad(lambda w: loss_f(key, x, y, model_of(w))))(w0))
    assert np.isfinite(gt) and np.isfinite(gf)
    # distinct gradients prove the branch participates when not stopped
    assert gt != gf


def test_r2r_loss_runs_and_is_finite():
    phys = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((2, 3, 48, 48), dtype=np.float32))
    y = phys.randomly_degrade(x, jax.random.PRNGKey(0), seed=0)
    loss = get_loss(
        method="proposed", physics=phys, sure_alternative="r2r",
        crop_training_pairs=False,
    )
    v = float(loss(jax.random.PRNGKey(1), x, y, lambda t: t))
    assert np.isfinite(v)


def test_r2r_ei_fused_matches_unfused():
    """r2r_ei_loss batches the R2R eval and the EI anchor into one 2B
    forward; given the same key it must equal the three-call reference form
    in value AND gradient (the model is per-image, so concat is a pure
    dispatch refactor)."""
    from sei_tpu.losses.r2r import r2r_ei_loss, r2r_ei_loss_unfused
    from sei_tpu.transforms import get_ei_transform

    phys = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    rng = np.random.default_rng(11)
    y = jnp.asarray(rng.random((2, 3, 48, 48), dtype=np.float32))
    t_apply = get_ei_transform("Scaling_Transforms", kind="padded")
    key = jax.random.PRNGKey(3)
    w0 = jnp.asarray(0.9)

    def run(loss_fn, w):
        return loss_fn(
            key, y, lambda t: w * t, phys.A, t_apply, sigma=5 / 255.0
        )

    vg = jax.jit(jax.value_and_grad(lambda w: run(r2r_ei_loss, w)))
    vg_ref = jax.jit(jax.value_and_grad(lambda w: run(r2r_ei_loss_unfused, w)))
    v_f, g_f = vg(w0)
    v_u, g_u = vg_ref(w0)
    np.testing.assert_allclose(float(v_f), float(v_u), rtol=1e-6)
    np.testing.assert_allclose(float(g_f), float(g_u), rtol=1e-6)


def test_method_aliases_and_ei_baselines():
    phys = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((2, 3, 32, 32), dtype=np.float32))
    y = phys.randomly_degrade(x, jax.random.PRNGKey(0), seed=0)
    for method in ("sup", "ei-shift", "ei-rotate", "css", "noise2inverse", "sure"):
        loss = get_loss(method=method, physics=phys, crop_size=16)
        v = float(loss(jax.random.PRNGKey(2), x, y, lambda t: t))
        assert np.isfinite(v), method


def test_weights_distance_loss():
    p = {"a": jnp.ones((2, 2)), "b": jnp.zeros((3,))}
    q = {"a": jnp.zeros((2, 2)), "b": jnp.zeros((3,))}
    v = float(weights_distance_loss(p, q, lambd=2.0))
    np.testing.assert_allclose(v, 2.0 * (1.0 + 0.0) / 2, atol=1e-7)


def test_fused_sure_matches_closed_form_linear_model():
    """get_loss('sure') fuses f(y), f(y+tau b) into one forward; for linear
    f(y)=a*y and A=I the value must still match the closed form."""
    phys = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    # bypass physics A by testing through the sure pieces directly
    from sei_tpu.losses.sure import sample_probe, sure_gaussian_loss_from_outputs

    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.standard_normal((4, 3, 16, 16)).astype(np.float32))
    a, sigma, tau = 0.7, 5 / 255.0, 1e-2
    b = sample_probe(jax.random.PRNGKey(0), y, 0)
    got = float(
        sure_gaussian_loss_from_outputs(
            y, a * y, a * (y + b * tau), b, _A_identity, sigma=sigma, tau=tau
        )
    )
    want = float(jnp.mean((a * y - y) ** 2)) + 2 * sigma**2 * a - sigma**2 / 4
    np.testing.assert_allclose(got, want, atol=5e-5)
