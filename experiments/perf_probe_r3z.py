#!/usr/bin/env python
"""Round-3z probe: post-gelu-saves step decomposition, conv-path focus.

State: bench 99.6 img/s (step ~80 ms, proposed/b8/48px/bf16).  The trunk
kernel is ~24 ms of chain grad; the rest is glue.  conv_mm (im2col with an
HBM patch tensor) REGRESSED 15% end-to-end, but that does not acquit the
convs - it only convicts the patch materialization.  This probe times:

  1. anchors: model fwd b8 / b16, grad supervised, grad proposed
  2. the seven 180->180 3x3 convs in isolation (XLA native conv), fwd+grad
  3. the same seven convs as 9-tap shift-matmuls (pad + 9 dot_generals,
     NO patch tensor: each tap is a lazily-sliced view contracted on C),
     fwd+grad
  4. LN glue (patch_embed_norm + final norm) fwd+grad
  5. EI-branch physics ops (scaling transform + blur A) grad

All legs use sei_tpu.utils.bench.bench_leg (fresh closures, dedup-proof
session-unique offsets).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/root/jaxcache", exist_ok=True)

import dataclasses

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")

import jax.numpy as jnp
import numpy as np

from sei_tpu.utils.bench import bench_leg

OFF = float(int(time.time()) % 100000)  # session-unique dedup offset


def conv_taps(x, w, b):
    """3x3 SAME conv as 9 shifted dot_generals (no patch tensor)."""
    B, H, W, C = x.shape
    co = w.shape[3]
    # NOTE: no preferred_element_type - the VJP's cotangent would then be
    # f32 against bf16 weights, which conv/dot transpose rejects.  bf16
    # inputs accumulate in f32 on the MXU anyway, matching nn.Conv's
    # dtype=bf16 behavior in the model.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((B, H, W, co), x.dtype)
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
            out = out + jax.lax.dot_general(
                xs, w[dy, dx],
                (((3,), (0,)), ((), ())),
            )
    return out + b


def conv_native(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def main():
    b, s, c = 8, 48, 180
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.standard_normal((b, s, s, c)), jnp.bfloat16) * 0.1
    ws = [
        (jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, jnp.bfloat16),
         jnp.asarray(rng.standard_normal(c) * 0.01, jnp.bfloat16))
        for _ in range(7)
    ]

    def report(tag, ms):
        print(f"{tag:34s}: {ms:7.2f} ms", flush=True)

    # --- [2] seven native convs, fwd ---
    def mk_native_fwd():
        def f(x, t):
            y = x + t.astype(x.dtype)
            for w, bb in ws:
                y = conv_native(y, w, bb)
            return y
        return f

    report("convs7 native fwd", bench_leg(mk_native_fwd, xf, offset=OFF))

    # --- [2] seven native convs, full grad (input + weights) ---
    def mk_native_grad():
        def loss(params, x):
            y = x
            for w, bb in params:
                y = conv_native(y, w, bb)
            return jnp.mean(y.astype(jnp.float32) ** 2)

        def f(x, t):
            return jax.grad(loss)(ws, x + t.astype(x.dtype))
        return f

    report("convs7 native grad(W)", bench_leg(mk_native_grad, xf, offset=OFF + 1e4))

    # --- [3] seven tap-matmul convs, fwd ---
    def mk_taps_fwd():
        def f(x, t):
            y = x + t.astype(x.dtype)
            for w, bb in ws:
                y = conv_taps(y, w, bb)
            return y
        return f

    report("convs7 taps fwd", bench_leg(mk_taps_fwd, xf, offset=OFF + 2e4))

    def mk_taps_grad():
        def loss(params, x):
            y = x
            for w, bb in params:
                y = conv_taps(y, w, bb)
            return jnp.mean(y.astype(jnp.float32) ** 2)

        def f(x, t):
            return jax.grad(loss)(ws, x + t.astype(x.dtype))
        return f

    report("convs7 taps grad(W)", bench_leg(mk_taps_grad, xf, offset=OFF + 3e4))

    # --- [4] LN glue: 2 LayerNorms over (b, s*s, c) tokens, f32 stats ---
    lnp = (jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32))

    def ln(x, sc, bi):
        xf32 = x.astype(jnp.float32)
        mu = xf32.mean(-1, keepdims=True)
        var = ((xf32 - mu) ** 2).mean(-1, keepdims=True)
        return ((xf32 - mu) * jax.lax.rsqrt(var + 1e-5) * sc + bi).astype(x.dtype)

    def mk_ln_grad():
        def loss(p, x):
            y = ln(x, *p)
            y = ln(y, *p)
            return jnp.mean(y.astype(jnp.float32) ** 2)

        def f(x, t):
            return jax.grad(loss)(lnp, x + t.astype(x.dtype))
        return f

    report("2x LN grad", bench_leg(mk_ln_grad, xf, offset=OFF + 4e4))

    # --- [1] model anchors ---
    from sei_tpu.losses import get_loss
    from sei_tpu.models import get_model
    from sei_tpu.physics import get_physics

    physics = get_physics(task="deblurring", kernel="Gaussian_R2", noise_level=5)
    model = get_model(kind="Proposed", architecture="Transformer",
                      task="deblurring", init_input_size=s)
    model.module = dataclasses.replace(model.module, dtype=jnp.bfloat16)
    params = model.params
    apply_fn = model.apply_fn
    xn = jnp.asarray(rng.random((b, 3, s, s), dtype=np.float32))

    def mk_fwd():
        def f(x, t):
            return apply_fn(params, x + t)
        return f

    report("model fwd b8", bench_leg(mk_fwd, xn, offset=OFF + 5e4))

    def mk_fwd16():
        def f(x, t):
            return apply_fn(params, jnp.concatenate([x + t, x + 2 * t]))
        return f

    report("model fwd b16 (2B SURE)", bench_leg(mk_fwd16, xn, offset=OFF + 6e4))

    def mk_gsup():
        def loss(p, x):
            return jnp.mean((apply_fn(p, x) - x) ** 2)

        def f(x, t):
            return jax.grad(loss)(params, x + t)
        return f

    report("grad supervised", bench_leg(mk_gsup, xn, offset=OFF + 7e4))

    key = jax.random.PRNGKey(7)
    y0 = physics.degrade(xn, key)

    for method in ("sure", "proposed"):
        loss_obj = get_loss(method=method, physics=physics, noise_level=5)

        def mk_gm(loss_obj=loss_obj):
            def lf(p, yy):
                return loss_obj(key, xn, yy, lambda im: apply_fn(p, im))

            def f(yy, t):
                return jax.grad(lf)(params, yy + t)
            return f

        report(f"grad {method}", bench_leg(mk_gm, y0, offset=OFF + 8e4))

    # --- [5] EI-branch ops alone: grad through A(T(x)) ---
    from sei_tpu.ops.scaling import padded_scaling_transform

    def mk_ei_ops():
        def lf(x):
            b = x.shape[0]
            rates = jnp.full((b,), 0.75, jnp.float32)
            centers = jnp.zeros((b, 2), jnp.float32)
            tx = padded_scaling_transform(x, rates, centers)
            return jnp.mean(physics.A(tx) ** 2)

        def f(x, t):
            return jax.grad(lf)(x + t)
        return f

    try:
        report("EI ops grad (T + A)", bench_leg(mk_ei_ops, xn, offset=OFF + 9e4))
    except Exception as e:  # signature drift; not critical
        print(f"EI ops leg skipped: {e}")


if __name__ == "__main__":
    main()
