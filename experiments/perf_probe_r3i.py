#!/usr/bin/env python
"""Round-3i probe: where does the trunk BACKWARD spend its time?

r3h showed grad(6-RSTB trunk) = 31.5 ms at b8/48px bf16 while the forward
kernels total ~2.8 ms -- backward is ~10x fwd but only ~3x the FLOPs.
Times, per ONE RSTB (6 blocks):
  1. fwd pallas kernel alone
  2. full vjp (fwd + bwd) -> bwd = (2) - (1)
  3. sweeps: SEI_TRUNK_G_BWD in {1,2,4}, WCH in {6,12,18,36}, TCH in
     {384,768,1536} (env knobs read at trace time; fresh jit per setting)
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


def timeit(fn, x, iters=20):
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    cur = x
    for _ in range(iters):
        out = fn(cur)
        cur = out[0] if isinstance(out, tuple) else out
        if cur.shape != x.shape:
            cur = x
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from sei_tpu.models.swinir import relative_position_index, shift_attn_mask
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

    def run(tag, env):
        for k, v in env.items():
            os.environ[k] = str(v)

        def fwd_only(xx):
            return st.swin_trunk(xx, params, rpb, mask, dpm,
                                 num_heads=nh, window_size=ws, use_pallas=True)

        def vjp_full(xx):
            y, pull = jax.vjp(
                lambda a, p, r: st.swin_trunk(a, p, r, mask, dpm,
                                              num_heads=nh, window_size=ws,
                                              use_pallas=True),
                xx, params, rpb)
            dx, dp, dr = pull(y)
            return dx

        try:
            f_ms = timeit(jax.jit(fwd_only), x)
            v_ms = timeit(jax.jit(vjp_full), x)
            print(f"{tag:42s}: fwd {f_ms:6.2f}  fwd+bwd {v_ms:6.2f}  "
                  f"bwd {v_ms - f_ms:6.2f} ms", flush=True)
        except Exception as e:
            print(f"{tag:42s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        for k in env:
            del os.environ[k]

    run("defaults", {})
    for gb in (1, 2, 4):
        run(f"G_BWD={gb}", {"SEI_TRUNK_G_BWD": gb})
    for wch in (6, 12, 18, 36):
        run(f"WCH={wch}", {"SEI_TRUNK_WCH": wch})
    for tch in (384, 768, 1536, 4608):
        run(f"TCH={tch}", {"SEI_TRUNK_TCH": tch})
    run("G_BWD=2 WCH=36 TCH=4608",
        {"SEI_TRUNK_G_BWD": 2, "SEI_TRUNK_WCH": 36, "SEI_TRUNK_TCH": 4608})
    # forward group sweep too (G=4 crashed in the bench sweep; get the error)
    for gf in (1, 2, 4):
        run(f"G_FWD={gf}", {"SEI_TRUNK_G": gf})


if __name__ == "__main__":
    main()
