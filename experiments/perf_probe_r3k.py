#!/usr/bin/env python
"""Round-3k probe: 6-RSTB-chain grad decomposition in ONE dispatch.

grad(6-RSTB chain) ~ 29.5 ms real, but 6x the single-RSTB vjp is only
~20 ms -- find the ~9 ms of per-chain XLA glue (weight-grad reductions,
pack_attn_params vjp, drpb reshapes) vs kernel time.
  full            : everything
  skip attn+mlp   : kernel loops zeroed -> fwd kernels + IO + dw writes +
                    XLA reductions + packing vjp (the glue)
Also: grad wrt x ONLY (no weight grads -> no dw outputs read by XLA).
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
        cur = out if out.shape == x.shape else x
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from sei_tpu.models.swinir import shift_attn_mask
    from sei_tpu.ops import swin_trunk as st

    b, h, w, c, d, nh, ws = 8, 48, 48, 180, 6, 6, 8
    n = ws * ws
    ch = int(c * 2.0)
    nr = 6  # RSTBs
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

    def chain(xx, ps, rs):
        for p, r in zip(ps, rs):
            xx = st.swin_trunk(xx, p, r, mask, dpm, num_heads=nh,
                               window_size=ws, use_pallas=True)
        return xx

    def run(tag, skip, wrt_weights=True):
        if skip:
            os.environ["SEI_TRUNK_PROF_SKIP"] = skip
        else:
            os.environ.pop("SEI_TRUNK_PROF_SKIP", None)

        def loss_w(ps, rs, xx):
            return jnp.sum(chain(xx, ps, rs).astype(jnp.float32) ** 2)

        if wrt_weights:
            g = jax.jit(lambda xx: jax.grad(loss_w)(rstbs, rpbs, xx)[0][0][
                "qkv_w"].astype(jnp.bfloat16)[0, :b, :c] * 0 + xx[:, 0, :, 0][
                    :, :, None].astype(jnp.bfloat16) * 0 + xx)
            # simpler: return grads; chain via x unchanged
            def gfn(xx):
                gs = jax.grad(loss_w)(rstbs, rpbs, xx)
                return xx + gs[0][0]["qkv_w"].astype(xx.dtype)[0, 0, 0] * 0
            g = jax.jit(gfn)
        else:
            def gfn(xx):
                return jax.grad(lambda a: loss_w(rstbs, rpbs, a))(xx)
            g = jax.jit(gfn)
        try:
            ms = timeit(g, x)
            print(f"{tag:28s}: {ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{tag:28s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    run("chain grad full", "")
    run("chain grad skip attn+mlp", "attn,mlp")
    run("chain grad-x-only full", "", wrt_weights=False)
    run("chain grad-x skip a+m", "attn,mlp", wrt_weights=False)
    os.environ.pop("SEI_TRUNK_PROF_SKIP", None)


if __name__ == "__main__":
    main()
