"""Classical / physics-based baseline models (eval-time, training-free).

Parity targets (ref src/models/__init__.py:103-140 registry):
  Identity, InverseFilter (= physics.A_dagger), Upsample (bicubic),
  TV (PGD with a total-variation prior, ref src/models/tv.py),
  DeepImagePrior (per-image optimization, ref src/models/dip.py).

PnP / DiffPIR / DPS require a pretrained DRUNet/DiffUNet denoiser; see
models/drunet.py - they are constructed with local weight files (this
environment has no network egress; the reference downloads them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..ops.resize import resize


def identity_model(physics):
    return lambda y: y


def inverse_filter_model(physics):
    return lambda y: physics.A_dagger(y)


def upsample_model(physics, factor: int | None = None):
    f = factor or physics.rate
    return lambda y: resize(y, scale_factor=float(f), antialias=False)


def _tv_prox_chambolle(x: jnp.ndarray, lambd: float, iters: int = 20) -> jnp.ndarray:
    """Prox of lambd*TV via Chambolle's dual projection (isotropic TV)."""

    def grad(u):
        gx = jnp.diff(u, axis=-1, append=u[..., -1:])
        gy = jnp.diff(u, axis=-2, append=u[..., -1:, :])
        return gx, gy

    def div(px, py):
        dx = jnp.concatenate([px[..., :1], px[..., 1:-1] - px[..., :-2], -px[..., -2:-1]], axis=-1)
        dy = jnp.concatenate(
            [py[..., :1, :], py[..., 1:-1, :] - py[..., :-2, :], -py[..., -2:-1, :]],
            axis=-2,
        )
        return dx + dy

    tau = 0.25

    def body(_, state):
        px, py = state
        gx, gy = grad(div(px, py) - x / lambd)
        norm = jnp.sqrt(gx * gx + gy * gy)
        denom = 1.0 + tau * norm
        return (px + tau * gx) / denom, (py + tau * gy) / denom

    px = jnp.zeros_like(x)
    py = jnp.zeros_like(x)
    px, py = jax.lax.fori_loop(0, iters, body, (px, py))
    return x - lambd * div(px, py)


def tv_model(physics, *, lambd: float | None = None, max_iter: int = 300):
    """PGD with L2 data fidelity and a TV prior (ref src/models/tv.py:7-30)."""
    lam = 0.1 if lambd is None else lambd

    def solve(y):
        # Lipschitz of A^T A <= 1 for our normalized operators; step 1.0.
        step = 1.0

        def body(_, x):
            grad = physics.A_adjoint(physics.A(x) - y)
            x = x - step * grad
            return _tv_prox_chambolle(x, lam * step)

        x0 = physics.A_adjoint(y)
        return jax.lax.fori_loop(0, max_iter, body, x0)

    return solve


# ---------------------------------------------------------------------------
# Deep Image Prior
# ---------------------------------------------------------------------------


def _conv_decoder_apply(params, z, *, channels, out_channels):
    """ConvDecoder forward: [upsample-bilinear x2 -> conv3x3 -> relu -> norm]*k."""
    x = z
    n = len(params["convs"])
    for i, w in enumerate(params["convs"]):
        last = i == n - 1
        if not last:
            b, c, h, wd = x.shape
            x = jax.image.resize(x, (b, c, h * 2, wd * 2), method="bilinear")
        x = jax.lax.conv_general_dilated(
            x, w["kernel"], (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
        ) + w["bias"][None, :, None, None]
        if not last:
            x = jax.nn.relu(x)
            mean = x.mean(axis=(0, 2, 3), keepdims=True)
            var = x.var(axis=(0, 2, 3), keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    return jax.nn.sigmoid(x)


def dip_model(
    physics,
    *,
    iterations: int = 1000,
    sr_factor: int | None = None,
    channels: int = 128,
    depth: int = 5,
    lr: float = 1e-2,
):
    """Deep-image-prior reconstruction: per-image inner optimization.

    A fresh random decoder is fit to each measurement by minimizing
    ||A(f(z)) - y||^2 over the decoder weights (ref src/models/dip.py:8-50).
    The inner Adam loop runs under lax.fori_loop inside one jitted graph.
    """

    def solve(y, key=None):
        key = jax.random.PRNGKey(0) if key is None else key
        rate = sr_factor if (sr_factor and physics.task == "sr") else 1
        out_h, out_w = y.shape[-2] * rate, y.shape[-1] * rate
        scale_steps = depth - 1
        zh, zw = out_h // (2**scale_steps), out_w // (2**scale_steps)
        k1, k2 = jax.random.split(key)
        z = jax.random.uniform(k1, (y.shape[0], channels, zh, zw)) * 0.1

        keys = jax.random.split(k2, depth)
        convs = []
        for i in range(depth):
            cin = channels
            cout = 3 if i == depth - 1 else channels
            w = jax.random.normal(keys[i], (cout, cin, 3, 3)) * jnp.sqrt(2.0 / (cin * 9))
            convs.append({"kernel": w, "bias": jnp.zeros((cout,))})
        params = {"convs": convs}

        opt = optax.adam(lr)

        def loss_fn(p):
            x = _conv_decoder_apply(p, z, channels=channels, out_channels=3)
            r = physics.A(x) - y
            return jnp.mean(r * r)

        def body(_, state):
            p, opt_state = state
            g = jax.grad(loss_fn)(p)
            updates, opt_state = opt.update(g, opt_state, p)
            return optax.apply_updates(p, updates), opt_state

        params, _ = jax.lax.fori_loop(0, iterations, body, (params, opt.init(params)))
        return _conv_decoder_apply(params, z, channels=channels, out_channels=3)

    return solve
