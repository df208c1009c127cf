#!/usr/bin/env python
"""Round-3g micro-decomposition: price every non-trunk piece of the step.

conv_mm (im2col) measured as a 15% END-TO-END REGRESSION on the real v5e
(bench triple 2026-08-17: 70.3 img/s ON vs 82.7 OFF), so this probe prices
the individual candidates with conv_mm OFF to find where the ~40ms of
backward glue actually lives: per-conv fwd/bwd, LN, patch embed, the
optimizer update, batch sampling, and the loss branches.
"""

import os
import sys
import time

os.environ.setdefault("SEI_CONV_MM", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")


def chain(fn, x, iters=30):
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out[0] if isinstance(out, tuple) else out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from sei_tpu.losses import get_loss
    from sei_tpu.models import get_model
    from sei_tpu.physics import get_physics

    b, s, c = 8, 48, 180
    rng = np.random.default_rng(0)
    xc = jnp.asarray(rng.random((b, s, s, c), dtype=np.float32), dtype=jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, dtype=jnp.float32)

    # --- one 180->180 3x3 conv: fwd and full grad ---
    def conv(x, wk):
        return jax.lax.conv_general_dilated(
            x, wk.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    f = jax.jit(lambda x: conv(x, w))
    print(f"conv180 fwd (x1)          : {chain(f, xc):7.2f} ms", flush=True)

    def closs(wk, x):
        return jnp.sum(conv(x, wk) ** 2)

    g = jax.jit(lambda x: (jax.grad(closs)(w, x), x))
    out = g(xc); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(30):
        out = g(out[1])
    jax.block_until_ready(out)
    print(f"conv180 grad dW+dX (x1)   : {(time.perf_counter()-t0)/30*1000:7.2f} ms", flush=True)

    # --- 9 chained convs (the per-forward conv inventory) fwd + grad ---
    ws9 = [w * (1.0 + 0.01 * i) for i in range(9)]

    def conv9(x, wks):
        for wk in wks:
            x = conv(x, wk)
        return x

    f9 = jax.jit(lambda x: conv9(x, ws9))
    print(f"conv180 x9 fwd            : {chain(f9, xc):7.2f} ms", flush=True)

    def c9loss(wks, x):
        return jnp.sum(conv9(x, wks) ** 2)

    g9 = jax.jit(lambda x: (jax.grad(c9loss)(ws9, x), x))
    out = g9(xc); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(30):
        out = g9(out[1])
    jax.block_until_ready(out)
    print(f"conv180 x9 grad           : {(time.perf_counter()-t0)/30*1000:7.2f} ms", flush=True)

    # --- LayerNorm over (B, HW, C) f32 stats, x12 (2 per RSTB + global) ---
    def ln(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)

    def ln12(x):
        for _ in range(12):
            x = ln(x)
        return x

    fln = jax.jit(ln12)
    print(f"LN x12 fwd                : {chain(fln, xc):7.2f} ms", flush=True)

    # --- full model + losses ---
    physics = get_physics(task="deblurring", kernel="Gaussian_R2", noise_level=5)
    model = get_model(kind="Proposed", architecture="Transformer",
                      task="deblurring", init_input_size=s)
    model.module = dataclasses.replace(model.module, dtype=jnp.bfloat16)
    params = model.params
    apply_fn = model.apply_fn
    x = jnp.asarray(rng.random((b, 3, s, s), dtype=np.float32))
    key = jax.random.PRNGKey(7)

    f_fwd = jax.jit(lambda xx: apply_fn(params, xx))
    print(f"model fwd b{b}             : {chain(f_fwd, x):7.2f} ms", flush=True)

    def sup_loss(p, xx):
        return jnp.mean((apply_fn(p, xx) - xx) ** 2)

    g_sup = jax.jit(lambda xx: (jax.grad(sup_loss)(params, xx), xx))
    out = g_sup(x); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = g_sup(out[1] + 1e-6)
    jax.block_until_ready(out)
    print(f"grad supervised           : {(time.perf_counter()-t0)/20*1000:7.2f} ms", flush=True)

    y = physics.degrade(x, key)
    for method, label in (("sure", "grad SURE"), ("proposed", "grad proposed")):
        loss = get_loss(method=method, physics=physics, noise_level=5)

        def lf(p, yy, kk):
            return loss(kk, x, yy, lambda im: apply_fn(p, im))

        gl = jax.jit(lambda yy, kk: (jax.grad(lf)(params, yy, kk), yy))
        out = gl(y, key); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(20):
            out = gl(out[1] + 1e-6, jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        print(f"{label:25s} : {(time.perf_counter()-t0)/20*1000:7.2f} ms", flush=True)

    # --- optimizer update alone (Adam over 11.9M params) ---
    import optax

    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    def upd(p, g_, st):
        u, st2 = tx.update(g_, st, p)
        return optax.apply_updates(p, u), st2

    grads = jax.tree_util.tree_map(lambda a: a * 0 + 1e-6, params)
    ju = jax.jit(upd)
    p2, st2 = ju(params, grads, opt_state)
    jax.block_until_ready(p2)
    t0 = time.perf_counter()
    for _ in range(30):
        p2, st2 = ju(p2, grads, st2)
    jax.block_until_ready(p2)
    print(f"adam update (11.9M)       : {(time.perf_counter()-t0)/30*1000:7.2f} ms", flush=True)

    # --- batch sampling + degradation (the data side of the step) ---
    from sei_tpu.data import DeviceDataCache, sample_train_batch

    n_img = 64
    xi = jnp.asarray(rng.random((n_img, 3, 256, 256), dtype=np.float32))
    yi = jax.jit(jax.vmap(
        lambda im, i: physics.randomly_degrade(im[None], key, seed=i)[0]
    ))(xi, jnp.arange(n_img))
    cache = DeviceDataCache(
        x=xi, y=yi, heights=jnp.full((n_img,), 256, jnp.int32),
        widths=jnp.full((n_img,), 256, jnp.int32),
        ids=jnp.arange(n_img), rate=1)

    def samp(kk):
        xx, yy = sample_train_batch(
            cache, kk, batch_size=b, crop_size=256, css=False, physics=physics,
            fresh_measurements=False, step=jnp.asarray(0, jnp.int32),
            steps_per_epoch=8, epoch_key=key)
        return jax.random.fold_in(kk, 1), xx.sum() + yy.sum()

    js = jax.jit(samp)
    out = js(key); jax.block_until_ready(out)
    t0 = time.perf_counter()
    o = key
    for _ in range(30):
        o, sm = js(o)
    jax.block_until_ready(sm)
    print(f"sample_train_batch        : {(time.perf_counter()-t0)/30*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
