#!/usr/bin/env python
"""Round-3v probe: measure the gelu/gelu'-saving kernel (valid methodology:
fresh named closures, strong refs, distinct inputs per call).

Anchors from r3u (pre-change): fwd 10.4, grad 29.8 ms per 6-RSTB chain.
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

OFF = 9900.0
_KEEP = []


def timeit(fn, x, iters=20, windows=3):
    ts = [jnp.float32(OFF + i) for i in range(iters * windows + 1)]
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
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.02, jnp.float32)

    rstbs = [{
        "ln1_s": jnp.ones((d, c)), "ln1_b": jnp.zeros((d, c)),
        "qkv_w": f32(d, c, 3 * c), "qkv_b": jnp.zeros((d, 3 * c)),
        "proj_w": f32(d, c, c), "proj_b": jnp.zeros((d, c)),
        "ln2_s": jnp.ones((d, c)), "ln2_b": jnp.zeros((d, c)),
        "fc1_w": f32(d, c, ch), "fc1_b": jnp.zeros((d, ch)),
        "fc2_w": f32(d, ch, c), "fc2_b": jnp.zeros((d, c)),
    } for _ in range(6)]
    rpbs = [f32(d, nh, n, n) for _ in range(6)]
    mask = np.asarray(shift_attn_mask(h, w, ws, ws // 2), np.float32)
    dpm = jnp.ones((d, 2, b), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)

    def chain(xx):
        for p, r in zip(rstbs, rpbs):
            xx = st.swin_trunk(xx, p, r, mask, dpm, num_heads=nh,
                               window_size=ws, use_pallas=True)
        return xx

    def run(tag, name, env, use_grad):
        for k, v in env.items():
            os.environ[k] = str(v)
        if use_grad:
            def fn(xx, t):
                return jax.grad(lambda a: jnp.sum(
                    chain(a).astype(jnp.float32) ** 2))(
                        xx + t.astype(xx.dtype))
        else:
            def fn(xx, t):
                return chain(xx + t.astype(xx.dtype))
        fn.__name__ = name
        _KEEP.append(fn)
        try:
            ms = timeit(jax.jit(fn), x)
            print(f"{tag:40s}: {ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{tag:40s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
        for k in env:
            os.environ.pop(k, None)

    run("fwd (gelu-save)", "x_f0", {}, False)
    run("grad (gelu-save)", "x_g0", {}, True)
    run("grad skip mlp (bwd)", "x_g2", {"SEI_TRUNK_PROF_SKIP": "mlp"}, True)
    run("grad skip attn (bwd)", "x_g1", {"SEI_TRUNK_PROF_SKIP": "attn"}, True)


if __name__ == "__main__":
    main()
