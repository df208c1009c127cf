#!/usr/bin/env python
"""Round-3l probe: FORWARD kernel decomposition + chain-mode timings.

Chain mode (6 RSTBs in one dispatch, overhead amortized):
  fwd full / fwd skip fattn / fwd skip fmlp / fwd skip both
  -> splits the ~2 ms/RSTB forward into attn, mlp, and glue+IO+steps.
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

    def run(tag, skip, grad=False):
        if skip:
            os.environ["SEI_TRUNK_PROF_SKIP"] = skip
        else:
            os.environ.pop("SEI_TRUNK_PROF_SKIP", None)
        fn = (jax.jit(jax.grad(lambda a: jnp.sum(
            chain(a).astype(jnp.float32) ** 2)))
            if grad else jax.jit(chain))
        try:
            ms = timeit(fn, x)
            print(f"{tag:34s}: {ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{tag:34s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    run("chain fwd full", "")
    run("chain fwd skip fattn", "fattn")
    run("chain fwd skip fmlp", "fmlp")
    run("chain fwd skip both", "fattn,fmlp")
    run("chain grad skip attn,mlp", "attn,mlp")
    run("chain grad skip ALL", "attn,mlp,fattn,fmlp")
    os.environ.pop("SEI_TRUNK_PROF_SKIP", None)


if __name__ == "__main__":
    main()
