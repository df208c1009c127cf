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
import numpy as np
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


def conv_decoder_sizes(in_size, out_size, layers):
    """deepinv ConvDecoder's geometric size schedule: layers-2 intermediate
    sizes interpolated as ceil(scale^n * in_size), then the output size."""
    sx = (out_size[0] / in_size[0]) ** (1.0 / (layers - 1))
    sy = (out_size[1] / in_size[1]) ** (1.0 / (layers - 1))
    hidden = [
        (
            int(np.ceil(sx**n * in_size[0])),
            int(np.ceil(sy**n * in_size[1])),
        )
        for n in range(1, layers - 1)
    ]
    return hidden + [tuple(out_size)]


def _nearest_resize_torch(x, size):
    """torch nn.Upsample(mode="nearest") parity: src = floor(i * in / out)."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = size
    iy = np.floor(np.arange(h_out) * (h_in / h_out)).astype(np.int32)
    ix = np.floor(np.arange(w_out) * (w_in / w_out)).astype(np.int32)
    return x[..., iy, :][..., ix]


def _batch_norm_train(x, scale, bias, eps=1e-5):
    """BatchNorm2d in train mode (batch statistics; DIP never runs eval)."""
    mean = x.mean(axis=(0, 2, 3), keepdims=True)
    var = x.var(axis=(0, 2, 3), keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * scale[None, :, None, None] + bias[None, :, None, None]


def _conv_decoder_apply(params, z, sizes):
    """deepinv ConvDecoder forward (deepinv/models/convdecoder.py, consumed
    at ref src/models/dip.py:36-39): per block upsample-nearest to the next
    scheduled size -> conv3x3 -> ReLU -> BatchNorm; then one extra
    conv3x3 -> ReLU -> BatchNorm at full size, and a linear 1x1 head."""
    x = z

    def conv(x, w, k):
        pad = "SAME" if k == 3 else "VALID"
        return jax.lax.conv_general_dilated(
            x, w["kernel"], (1, 1), pad,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + w["bias"][None, :, None, None]

    for i, size in enumerate(sizes):
        x = _nearest_resize_torch(x, size)
        x = conv(x, params["convs"][i], 3)
        x = jax.nn.relu(x)
        x = _batch_norm_train(x, params["bn_scale"][i], params["bn_bias"][i])
    i = len(sizes)
    x = conv(x, params["convs"][i], 3)
    x = jax.nn.relu(x)
    x = _batch_norm_train(x, params["bn_scale"][i], params["bn_bias"][i])
    return conv(x, params["head"], 1)


def dip_model(
    physics,
    *,
    iterations: int = 1000,
    sr_factor: int | None = None,
    channels: int = 32,
    layers: int = 7,
    in_size: tuple = (16, 16),
    lr: float = 5e-3,
):
    """Deep-image-prior reconstruction: per-image inner optimization.

    deepinv-faithful: a fresh ConvDecoder (geometric nearest-upsample
    schedule from ``in_size`` to the output size over ``layers`` blocks,
    channels=32, Adam lr 5e-3, uniform(0, 0.1) latent) is fit to each
    measurement by minimizing ||A(f(z)) - y||^2 (ref src/models/dip.py:8-50
    with deepinv's ConvDecoder + DeepImagePrior defaults).  The inner Adam
    loop runs under lax.fori_loop inside one jitted graph.
    """

    def solve(y, key=None):
        key = jax.random.PRNGKey(0) if key is None else key
        rate = sr_factor if (sr_factor and physics.task == "sr") else 1
        out_h, out_w = y.shape[-2] * rate, y.shape[-1] * rate
        sizes = conv_decoder_sizes(in_size, (out_h, out_w), layers)
        k1, k2 = jax.random.split(key)
        z = jax.random.uniform(k1, (y.shape[0], channels, *in_size)) * 0.1

        n_convs = len(sizes) + 1
        keys = jax.random.split(k2, n_convs + 1)
        convs = []
        for i in range(n_convs):
            w = jax.random.normal(keys[i], (channels, channels, 3, 3)) * jnp.sqrt(
                2.0 / (channels * 9)
            )
            convs.append({"kernel": w, "bias": jnp.zeros((channels,))})
        head = {
            "kernel": jax.random.normal(keys[-1], (3, channels, 1, 1))
            * jnp.sqrt(2.0 / channels),
            "bias": jnp.zeros((3,)),
        }
        params = {
            "convs": convs,
            "head": head,
            "bn_scale": [jnp.ones((channels,)) for _ in range(n_convs)],
            "bn_bias": [jnp.zeros((channels,)) for _ in range(n_convs)],
        }

        opt = optax.adam(lr)

        def loss_fn(p):
            x = _conv_decoder_apply(p, z, sizes)
            r = physics.A(x) - y
            return jnp.mean(r * r)

        def body(_, state):
            p, opt_state = state
            g = jax.grad(loss_fn)(p)
            updates, opt_state = opt.update(g, opt_state, p)
            return optax.apply_updates(p, updates), opt_state

        params, _ = jax.lax.fori_loop(0, iterations, body, (params, opt.init(params)))
        return _conv_decoder_apply(params, z, sizes)

    return solve
