#!/usr/bin/env python
"""Round-3j probe: decompose the trunk BACKWARD kernel's 3.2 ms/RSTB.

Uses SEI_TRUNK_PROF_SKIP (trace-time, wrong-grads, profiling only) to zero
out whole branches of _block_bwd_image:
  full        : everything
  skip attn   : remaining = mlp bwd + LN1/rolls/window glue + dw writes + IO
  skip mlp    : remaining = attn bwd + glue
  skip both   : glue + xs/xs2 IO + dw writes only
Each timing includes ~2-3 ms tunnel dispatch overhead; compare DELTAS.
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
        cur = jnp.reshape(out, x.shape) if out.size == x.size else x
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from sei_tpu.models.swinir import shift_attn_mask
    from sei_tpu.ops import swin_trunk as st

    b, h, w, c, d, nh, ws = 8, 48, 48, 180, 6, 6, 8
    n = ws * ws
    ch = int(c * 2.0)
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.02, jnp.float32)

    params = {
        "ln1_s": jnp.ones((d, c)), "ln1_b": jnp.zeros((d, c)),
        "qkv_w": f32(d, c, 3 * c), "qkv_b": jnp.zeros((d, 3 * c)),
        "proj_w": f32(d, c, c), "proj_b": jnp.zeros((d, c)),
        "ln2_s": jnp.ones((d, c)), "ln2_b": jnp.zeros((d, c)),
        "fc1_w": f32(d, c, ch), "fc1_b": jnp.zeros((d, ch)),
        "fc2_w": f32(d, ch, c), "fc2_b": jnp.zeros((d, c)),
    }
    rpb = f32(d, nh, n, n)
    mask = np.asarray(shift_attn_mask(h, w, ws, ws // 2), np.float32)
    dpm = jnp.ones((d, 2, b), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)

    def run(tag, skip):
        if skip:
            os.environ["SEI_TRUNK_PROF_SKIP"] = skip
        else:
            os.environ.pop("SEI_TRUNK_PROF_SKIP", None)

        def vjp_full(xx):
            y, pull = jax.vjp(
                lambda a, p, r: st.swin_trunk(a, p, r, mask, dpm,
                                              num_heads=nh, window_size=ws,
                                              use_pallas=True),
                xx, params, rpb)
            dx, dp, dr = pull(y)
            return dx

        try:
            ms = timeit(jax.jit(vjp_full), x)
            print(f"{tag:24s}: fwd+bwd {ms:6.2f} ms", flush=True)
        except Exception as e:
            print(f"{tag:24s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    run("full", "")
    run("skip attn", "attn")
    run("skip mlp", "mlp")
    run("skip attn+mlp", "attn,mlp")
    os.environ.pop("SEI_TRUNK_PROF_SKIP", None)


if __name__ == "__main__":
    main()
