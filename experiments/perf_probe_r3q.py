#!/usr/bin/env python
"""Round-3q probe: r3p redone with a REAL perturbation.

r3p's x*(1+t*1e-6) rounds to x in bf16 -> identical inputs -> tunnel dedup
-> fake 0.03 ms. Here each call adds a DISTINCT bf16-representable scalar
(x + t, t = 1,2,3,...), verified different on device. Re-measures:
  copy-kernel chains (per-pallas-call overhead),
  XLA add chain (control),
  trunk fwd full / skipALL, grad full / skipALL (the r3o conclusions).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

os.makedirs("/root/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")

b, h, w, c = 8, 48, 48, 180


def timeit(fn, x, iters=20, windows=3):
    ts = [jnp.float32(1 + i) for i in range(iters * windows + 1)]
    out = fn(x, ts[0])
    jax.block_until_ready(out)
    meds = []
    k = 1
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x, ts[k])
            k += 1
        jax.block_until_ready(out)
        meds.append((time.perf_counter() - t0) / iters * 1000)
    return sorted(meds)[len(meds) // 2]


def copy_kernel(x_ref, y_ref):
    y_ref[...] = x_ref[...] + 1.0


def one_copy(xx, steps):
    gsz = b // steps if steps <= b else b
    return pl.pallas_call(
        copy_kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec((gsz, h, w, c), lambda i: (i % (b // gsz), 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((gsz, h, w, c), lambda i: (i % (b // gsz), 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xx.shape, xx.dtype),
    )(xx)


def main():
    from sei_tpu.models.swinir import shift_attn_mask
    from sei_tpu.ops import swin_trunk as st

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)

    # perturbation sanity: x+1 differs from x+2 in bf16
    assert not np.allclose(np.asarray((x + 1.0)[0, 0, 0, :3], np.float32),
                           np.asarray((x + 2.0)[0, 0, 0, :3], np.float32))

    def mk(n_calls, steps):
        def fn(xx, t):
            xx = xx + t.astype(xx.dtype)
            for _ in range(n_calls):
                xx = one_copy(xx, steps)
            return xx
        return jax.jit(fn)

    for n_calls in (1, 6, 12, 24):
        ms = timeit(mk(n_calls, 4), x)
        print(f"{n_calls:3d} copy kernels grid=(4,)      : {ms:7.2f} ms",
              flush=True)
    ms = timeit(mk(6, 24), x)
    print(f"  6 copy kernels grid=(24,)     : {ms:7.2f} ms", flush=True)

    def xla_chain(xx, t):
        xx = xx + t.astype(xx.dtype)
        for _ in range(24):
            xx = xx + 1.0
        return xx
    ms = timeit(jax.jit(xla_chain), x)
    print(f" 24 XLA adds (control)          : {ms:7.2f} ms", flush=True)

    # ---- trunk legs with the real perturbation -----------------------------
    d, nh, ws = 6, 6, 8
    n = ws * ws
    ch = int(c * 2.0)
    nr = 6
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.02, jnp.float32)

    def rstb_params():
        return {
            "ln1_s": jnp.ones((d, c)), "ln1_b": jnp.zeros((d, c)),
            "qkv_w": f32(d, c, 3 * c), "qkv_b": jnp.zeros((d, 3 * c)),
            "proj_w": f32(d, c, c), "proj_b": jnp.zeros((d, c)),
            "ln2_s": jnp.ones((d, c)), "ln2_b": jnp.zeros((d, c)),
            "fc1_w": f32(d, c, ch), "fc1_b": jnp.zeros((d, ch)),
            "fc2_w": f32(d, ch, c), "fc2_b": jnp.zeros((d, c)),
        }

    rstbs = [rstb_params() for _ in range(nr)]
    rpbs = [f32(d, nh, n, n) for _ in range(nr)]
    mask = np.asarray(shift_attn_mask(h, w, ws, ws // 2), np.float32)
    dpm = jnp.ones((d, 2, b), jnp.float32)

    def chain(xx):
        for p, r in zip(rstbs, rpbs):
            xx = st.swin_trunk(xx, p, r, mask, dpm, num_heads=nh,
                               window_size=ws, use_pallas=True)
        return xx

    def fwd_t(xx, t):
        return chain(xx + t.astype(xx.dtype))

    def grad_t(xx, t):
        return jax.grad(lambda a: jnp.sum(
            chain(a).astype(jnp.float32) ** 2))(xx + t.astype(xx.dtype))

    def run(tag, env, use_grad):
        for k, v in env.items():
            os.environ[k] = str(v)
        fn = jax.jit(grad_t if use_grad else fwd_t)
        try:
            ms = timeit(fn, x)
            print(f"{tag:34s}: {ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{tag:34s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
        for k in env:
            os.environ.pop(k, None)

    run("trunk fwd full", {}, False)
    run("trunk fwd skipALL", {"SEI_TRUNK_PROF_SKIP": "fattn,fmlp"}, False)
    run("trunk fwd full G=8", {"SEI_TRUNK_G": 8}, False)
    run("trunk grad full", {}, True)
    run("trunk grad skipALL",
        {"SEI_TRUNK_PROF_SKIP": "attn,mlp,fattn,fmlp"}, True)
    run("trunk grad G=8 both",
        {"SEI_TRUNK_G": 8, "SEI_TRUNK_G_BWD": 8}, True)


if __name__ == "__main__":
    main()
