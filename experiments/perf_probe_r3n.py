#!/usr/bin/env python
"""Round-3n probe: settle the r3l/r3m discrepancy with A/B/A repeats in one
process, and extend the G sweep to the GRAD chain.

  fwd G=2 (x3 interleaved)      -- is 9.9 vs 2.4 ms real or drift?
  grad G=2 / G=4 / G=8          -- does the 29.7 ms grad collapse too?
  grad skipALL per G            -- scaffolding share at each G
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


def timeit(fn, x, iters=30):
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    cur = x
    for _ in range(iters):
        out = fn(cur)
        cur = out if out.shape == x.shape else x
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


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

    gradfn = jax.grad(lambda a: jnp.sum(chain(a).astype(jnp.float32) ** 2))

    def run(tag, env, use_grad):
        for k, v in env.items():
            os.environ[k] = str(v)
        fn = jax.jit(gradfn if use_grad else chain)
        try:
            ms = timeit(fn, x)
            print(f"{tag:34s}: {ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{tag:34s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
        for k in env:
            os.environ.pop(k, None)

    run("fwd G=2 (a)", {"SEI_TRUNK_G": 2}, False)
    run("grad G=2 (a)", {"SEI_TRUNK_G": 2, "SEI_TRUNK_G_BWD": 2}, True)
    run("fwd G=2 (b)", {"SEI_TRUNK_G": 2}, False)
    run("grad G=4", {"SEI_TRUNK_G": 4, "SEI_TRUNK_G_BWD": 4}, True)
    run("grad G=8", {"SEI_TRUNK_G": 8, "SEI_TRUNK_G_BWD": 8}, True)
    run("fwd G=2 (c)", {"SEI_TRUNK_G": 2}, False)
    run("grad G=2 (b)", {"SEI_TRUNK_G": 2, "SEI_TRUNK_G_BWD": 2}, True)
    run("grad G=8 skipALL",
        {"SEI_TRUNK_G": 8, "SEI_TRUNK_G_BWD": 8,
         "SEI_TRUNK_PROF_SKIP": "attn,mlp,fattn,fmlp"}, True)
    run("grad G=2 skipALL",
        {"SEI_TRUNK_G": 2, "SEI_TRUNK_G_BWD": 2,
         "SEI_TRUNK_PROF_SKIP": "attn,mlp,fattn,fmlp"}, True)


if __name__ == "__main__":
    main()
