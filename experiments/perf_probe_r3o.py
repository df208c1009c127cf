#!/usr/bin/env python
"""Round-3o probe: DEDUP-PROOF trunk decomposition.

Earlier probes disagreed (2.4 vs 9.9 ms for the same fwd config) because
the axon tunnel dedupes identical executions and the PROF_SKIP chains
saturate to fixed points (residual doubling -> inf), making every
post-saturation call identical. Here every timed call takes a DISTINCT
scalar t and perturbs the input on-device (x * (1 + t*1e-6)), so no two
executions are identical and outputs can't saturate. Median of 3 windows.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")


def timeit(fn, x, iters=20, windows=3):
    ts = [jnp.float32(i) for i in range(iters * windows + 1)]
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


def main():
    from sei_tpu.models.swinir import shift_attn_mask
    from sei_tpu.ops import swin_trunk as st

    b, h, w, c, d, nh, ws = 8, 48, 48, 180, 6, 6, 8
    n = ws * ws
    ch = int(c * 2.0)
    nr = 6
    rng = np.random.default_rng(0)
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
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)

    def chain(xx):
        for p, r in zip(rstbs, rpbs):
            xx = st.swin_trunk(xx, p, r, mask, dpm, num_heads=nh,
                               window_size=ws, use_pallas=True)
        return xx

    def fwd_t(xx, t):
        return chain(xx * (1 + t * 1e-6).astype(xx.dtype))

    def grad_t(xx, t):
        return jax.grad(lambda a: jnp.sum(
            chain(a).astype(jnp.float32) ** 2))(
                xx * (1 + t * 1e-6).astype(xx.dtype))

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

    run("fwd full", {}, False)
    run("fwd skip fattn", {"SEI_TRUNK_PROF_SKIP": "fattn"}, False)
    run("fwd skip fmlp", {"SEI_TRUNK_PROF_SKIP": "fmlp"}, False)
    run("fwd skipALL", {"SEI_TRUNK_PROF_SKIP": "fattn,fmlp"}, False)
    run("fwd full G=8", {"SEI_TRUNK_G": 8}, False)
    run("grad full", {}, True)
    run("grad skip attn", {"SEI_TRUNK_PROF_SKIP": "attn"}, True)
    run("grad skip mlp", {"SEI_TRUNK_PROF_SKIP": "mlp"}, True)
    run("grad skip attn,mlp", {"SEI_TRUNK_PROF_SKIP": "attn,mlp"}, True)
    run("grad skipALL",
        {"SEI_TRUNK_PROF_SKIP": "attn,mlp,fattn,fmlp"}, True)
    run("grad full G=8 both",
        {"SEI_TRUNK_G": 8, "SEI_TRUNK_G_BWD": 8}, True)


if __name__ == "__main__":
    main()
