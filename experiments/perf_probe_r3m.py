#!/usr/bin/env python
"""Round-3m probe: is the trunk cost per-GRID-STEP overhead?

r3l: chain fwd with ALL compute skipped = 9.9 ms == full fwd. So the cost
is scaffolding. If it scales with grid steps (b/G * npairs), bigger G must
cut it linearly:
  G=2 -> 12 steps, G=4 -> 6, G=8 -> 3 (per RSTB fwd)
Also: a minimal pallas copy kernel with grid=(12,) / (3,) to measure raw
per-step cost, and a no-xs variant check via skip-ALL grad.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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

    def run(tag, env, fn_builder):
        for k, v in env.items():
            os.environ[k] = str(v)
        try:
            ms = timeit(fn_builder(), x)
            print(f"{tag:34s}: {ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{tag:34s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
        for k in env:
            os.environ.pop(k, None)

    for g in (2, 4, 8):
        run(f"chain fwd skipALL G={g}",
            {"SEI_TRUNK_PROF_SKIP": "fattn,fmlp", "SEI_TRUNK_G": g},
            lambda: jax.jit(chain))
    for g in (4, 8):
        run(f"chain fwd FULL G={g}", {"SEI_TRUNK_G": g},
            lambda: jax.jit(chain))

    # minimal copy kernel: same x, grid=(steps,), VMEM block per step
    def copy_kernel(x_ref, y_ref):
        y_ref[...] = x_ref[...]

    def mk_copy(steps):
        gsz = b // steps if steps <= b else 1

        def run_copy(xx):
            out = xx
            for _ in range(nr * 3):  # 18 pallas calls ~ 6 RSTB x 3 pair-steps
                out = pl.pallas_call(
                    copy_kernel,
                    grid=(steps,),
                    in_specs=[pl.BlockSpec((gsz, h, w, c),
                                           lambda i: (i, 0, 0, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((gsz, h, w, c),
                                           lambda i: (i, 0, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
                )(out)
            return out
        return jax.jit(run_copy)

    for steps in (4, 8):
        run(f"18x copy kernels grid=({steps},)", {}, lambda: mk_copy(steps))


if __name__ == "__main__":
    main()
