#!/usr/bin/env python
"""Round-3 kernel tuning probe: G (images/grid-step), WCH, TCH sweeps.

Times the fused trunk forward and forward+backward on the flagship RSTB
shape (48px, C=180, 6 blocks, heads 6, ws 8) with chained inputs (the axon
relay dedupes identical executions).  Env knobs are read at trace time, so
one process sweeps all configs.

Usage: python experiments/perf_probe_r3.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")

D, C, NH, WS, H = 6, 180, 6, 8, 48
CH = 2 * C
N = WS * WS


def make_inputs(b, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)
    params = {
        "ln1_s": jnp.ones((D, C)), "ln1_b": jnp.zeros((D, C)),
        "qkv_w": 0.02 * jax.random.normal(ks[0], (D, C, 3 * C)),
        "qkv_b": jnp.zeros((D, 3 * C)),
        "proj_w": 0.02 * jax.random.normal(ks[1], (D, C, C)),
        "proj_b": jnp.zeros((D, C)),
        "ln2_s": jnp.ones((D, C)), "ln2_b": jnp.zeros((D, C)),
        "fc1_w": 0.02 * jax.random.normal(ks[2], (D, C, CH)),
        "fc1_b": jnp.zeros((D, CH)),
        "fc2_w": 0.02 * jax.random.normal(ks[3], (D, CH, C)),
        "fc2_b": jnp.zeros((D, C)),
    }
    params = {k: v.astype(jnp.float32) for k, v in params.items()}
    rpb = 0.02 * jax.random.normal(ks[4], (D, NH, N, N), jnp.float32)
    from sei_tpu.models.swinir import shift_attn_mask

    mask = shift_attn_mask(H, H, WS, WS // 2)
    dpm = jnp.ones((D, 2, b), jnp.float32)
    x = jax.random.normal(ks[5], (b, H, H, C), dtype)
    return x, params, rpb, mask, dpm


def time_fn(fn, x, iters=30):
    out = fn(x)
    jax.block_until_ready(out)
    xs = out if out.shape == x.shape else x
    t0 = time.time()
    cur = x
    for _ in range(iters):
        cur = fn(cur)
        if cur.shape != x.shape:
            cur = x
    jax.block_until_ready(cur)
    return (time.time() - t0) / iters * 1e3


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from sei_tpu.ops.swin_trunk import swin_trunk

    x, params, rpb, mask, dpm = make_inputs(b)

    def run_cfg(g, wch, tch, g_bwd=None):
        os.environ["SEI_TRUNK_G"] = str(g)
        os.environ["SEI_TRUNK_G_BWD"] = str(g_bwd if g_bwd else max(g // 2, 1))
        os.environ["SEI_TRUNK_WCH"] = str(wch)
        os.environ["SEI_TRUNK_TCH"] = str(tch)

        @jax.jit
        def fwd(xx):
            return swin_trunk(xx, params, rpb, mask, dpm,
                              num_heads=NH, window_size=WS, use_pallas=True)

        @jax.jit
        def fwdbwd(xx):
            def loss(xx):
                y = swin_trunk(xx, params, rpb, mask, dpm,
                               num_heads=NH, window_size=WS, use_pallas=True)
                return jnp.sum(y * y) * 1e-6
            g_ = jax.grad(loss)(xx)
            return g_.astype(xx.dtype)

        tf = time_fn(fwd, x)
        tb = time_fn(fwdbwd, x)
        print(f"g={g:2d} wch={wch:3d} tch={tch:5d}: fwd {tf:6.2f} ms  "
              f"fwd+bwd {tb:6.2f} ms", flush=True)

    mode = sys.argv[2] if len(sys.argv) > 2 else "g"
    if mode == "g":
        for g in (1, 2, 4, 8):
            if b % g == 0:
                run_cfg(g, 12, 768)
    elif mode == "wch":
        g = int(sys.argv[3]) if len(sys.argv) > 3 else 4
        for wch in (4, 6, 18, 36):
            run_cfg(g, wch, 768)
    elif mode == "tch":
        g = int(sys.argv[3]) if len(sys.argv) > 3 else 4
        for tch in (384, 1536, 4608):
            run_cfg(g, 12, tch)
    else:  # "one": g wch tch from argv
        run_cfg(int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5]))


if __name__ == "__main__":
    main()
