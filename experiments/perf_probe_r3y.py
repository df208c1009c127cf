#!/usr/bin/env python
"""Round-3y probe (valid methodology): post-fast-gelu kernel state, chunk
knobs, and the optimizer's real in-step cost.

Every leg: fresh closure, unique __name__, strong ref, session-unique
dedup-proof inputs.
  1. chain fwd / grad (fast-gelu + saves)    vs r3x anchors 10.8 / 24.0
  2. WCH in {12, 36}, TCH in {768, 4608}     (first VALID chunk sweep)
  3. flat-adam update standalone: optax.flatten vs raw tree vs a manual
     pre-raveled adam (isolates the per-step ravel/unravel concat cost)
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

OFF = 31337.0
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
            print(f"{tag:42s}: {ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{tag:42s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
        for k in env:
            os.environ.pop(k, None)

    run("fwd  fast-gelu+saves", "y_f0", {}, False)
    run("grad fast-gelu+saves", "y_g0", {}, True)
    run("grad WCH=36", "y_g1", {"SEI_TRUNK_WCH": 36}, True)
    run("grad TCH=4608", "y_g2", {"SEI_TRUNK_TCH": 4608}, True)
    run("grad WCH=36 TCH=4608", "y_g3",
        {"SEI_TRUNK_WCH": 36, "SEI_TRUNK_TCH": 4608}, True)
    run("grad exact-gelu (SEI_FAST_GELU=0)", "y_g4",
        {"SEI_FAST_GELU": "0"}, True)

    # ---- optimizer cost isolation -----------------------------------------
    import optax

    from sei_tpu.models import get_model

    model = get_model(kind="Proposed", architecture="Transformer",
                      task="deblurring", init_input_size=48)
    params = jax.tree_util.tree_map(jnp.asarray, model.params)
    flat0, unravel = jax.flatten_util.ravel_pytree(params)

    def mk_opt(tag, name, style):
        tx = optax.adam(1e-4)
        if style == "flatten":
            tx = optax.flatten(tx)
        if style == "raw_vec":
            st_ = tx.init(flat0)
        else:
            st_ = tx.init(params)

        def upd_tree(p, g_, s):
            u, s2 = tx.update(g_, s, p)
            return optax.apply_updates(p, u), s2

        if style == "raw_vec":
            def fn(xx, t):
                g_ = flat0 * 0 + t  # varying grads, one vector
                p2, _ = upd_tree(flat0, g_, st_)
                return p2[:8].astype(jnp.bfloat16) * 0 + xx
        else:
            def fn(xx, t):
                g_ = jax.tree_util.tree_map(lambda a: a * 0 + t, params)
                p2, _ = upd_tree(params, g_, st_)
                leaf = jax.tree_util.tree_leaves(p2)[0]
                return leaf.reshape(-1)[:1].astype(jnp.bfloat16) * 0 + xx
        fn.__name__ = name
        _KEEP.append(fn)
        try:
            ms = timeit(jax.jit(fn), x)
            print(f"{tag:42s}: {ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{tag:42s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    mk_opt("adam tree (11.9M)", "y_o0", "tree")
    mk_opt("adam optax.flatten", "y_o1", "flatten")
    mk_opt("adam raw flat vector (no ravel)", "y_o2", "raw_vec")


if __name__ == "__main__":
    main()
