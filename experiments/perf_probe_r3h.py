#!/usr/bin/env python
"""Round-3h probe: is the backward glue (a) param re-stacking + per-group
weight-grad reduction around the trunk kernel, or (b) something else?

Times, on the real chip (b8/48px bf16):
  1. grad of ONE trunk call with params PRE-STACKED outside grad
  2. grad of ONE trunk call with stacking INSIDE grad (flax-layout leaves,
     jnp.stack per leaf + rpb one-hot matmuls, as models/swinir._fused_apply)
  3. the same pair for a 6-RSTB chain (the real trunk inventory)
  4. optax.adam vs optax.flatten(optax.adam) on the full 11.9M param tree
"""

import os
import sys
import time

os.environ.setdefault("SEI_CONV_MM", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")


def timeit(fn, *args, iters=20, chain_idx=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    cur = args
    for i in range(iters):
        out = fn(*cur)
        if chain_idx is not None:
            lst = list(cur)
            lst[chain_idx] = out[1]
            cur = tuple(lst)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from sei_tpu.models.swinir import relative_position_index, shift_attn_mask
    from sei_tpu.ops.swin_trunk import swin_trunk

    b, h, w, c, d, nh, ws = 8, 48, 48, 180, 6, 6, 8
    n = ws * ws
    ch = int(c * 2.0)
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.02, jnp.float32)

    def one_rstb_flax():
        """Per-block leaves, flax layout (what the model stores today)."""
        blocks = []
        for _ in range(d):
            blocks.append({
                "ln1_s": jnp.ones((c,)), "ln1_b": jnp.zeros((c,)),
                "qkv_w": f32(c, 3 * c), "qkv_b": jnp.zeros((3 * c,)),
                "proj_w": f32(c, c), "proj_b": jnp.zeros((c,)),
                "ln2_s": jnp.ones((c,)), "ln2_b": jnp.zeros((c,)),
                "fc1_w": f32(c, ch), "fc1_b": jnp.zeros((ch,)),
                "fc2_w": f32(ch, c), "fc2_b": jnp.zeros((c,)),
                "rpb_table": f32((2 * ws - 1) ** 2, nh),
            })
        return blocks

    idx = relative_position_index(ws).reshape(-1)
    onehot = np.zeros((n * n, (2 * ws - 1) ** 2), np.float32)
    onehot[np.arange(n * n), idx] = 1.0
    oh = jnp.asarray(onehot)
    mask = shift_attn_mask(h, w, ws, ws // 2)
    dpm = jnp.ones((d, 2, b), jnp.float32)

    def stack_blocks(blocks):
        stacked = {
            leaf: jnp.stack([bl[leaf] for bl in blocks])
            for leaf in blocks[0] if leaf != "rpb_table"
        }
        rpb = jnp.stack([
            (oh @ bl["rpb_table"].astype(jnp.float32))
            .reshape(n, n, nh).transpose(2, 0, 1)
            for bl in blocks
        ])
        return stacked, rpb

    n_rstb = 6
    rstbs_flax = [one_rstb_flax() for _ in range(n_rstb)]
    rstbs_stacked = [stack_blocks(bl) for bl in rstbs_flax]

    x0 = jnp.asarray(rng.random((b, h, w, c)), jnp.bfloat16)

    # --- 6-RSTB chain, pre-stacked params ---
    def fwd_pre(params_list, x):
        for stacked, rpb in params_list:
            x = swin_trunk(x, stacked, rpb, mask, dpm,
                           num_heads=nh, window_size=ws)
        return x

    def loss_pre(params_list, x):
        return jnp.sum(fwd_pre(params_list, x).astype(jnp.float32) ** 2)

    g_pre = jax.jit(lambda pl_, xx: (jax.grad(loss_pre)(pl_, xx), xx))
    ms = timeit(g_pre, rstbs_stacked, x0, chain_idx=None)
    print(f"grad 6-RSTB prestacked   : {ms:7.2f} ms", flush=True)

    # --- 6-RSTB chain, stacking inside grad (today's _fused_apply) ---
    def fwd_stackin(rstbs, x):
        for blocks in rstbs:
            stacked, rpb = stack_blocks(blocks)
            x = swin_trunk(x, stacked, rpb, mask, dpm,
                           num_heads=nh, window_size=ws)
        return x

    def loss_stackin(rstbs, x):
        return jnp.sum(fwd_stackin(rstbs, x).astype(jnp.float32) ** 2)

    g_sin = jax.jit(lambda pl_, xx: (jax.grad(loss_stackin)(pl_, xx), xx))
    ms = timeit(g_sin, rstbs_flax, x0)
    print(f"grad 6-RSTB stack-inside : {ms:7.2f} ms", flush=True)

    # --- 3 chained model evals of the 6-RSTB trunk (proposed-step shape) ---
    def loss3_pre(params_list, x):
        a = fwd_pre(params_list, x)
        bb = fwd_pre(params_list, a)
        cc = fwd_pre(params_list, bb)
        return jnp.sum(cc.astype(jnp.float32) ** 2)

    g3_pre = jax.jit(lambda pl_, xx: (jax.grad(loss3_pre)(pl_, xx), xx))
    ms = timeit(g3_pre, rstbs_stacked, x0, iters=10)
    print(f"grad 3-eval prestacked   : {ms:7.2f} ms", flush=True)

    def loss3_sin(rstbs, x):
        a = fwd_stackin(rstbs, x)
        bb = fwd_stackin(rstbs, a)
        cc = fwd_stackin(rstbs, bb)
        return jnp.sum(cc.astype(jnp.float32) ** 2)

    g3_sin = jax.jit(lambda pl_, xx: (jax.grad(loss3_sin)(pl_, xx), xx))
    ms = timeit(g3_sin, rstbs_flax, x0, iters=10)
    print(f"grad 3-eval stack-inside : {ms:7.2f} ms", flush=True)

    # --- optimizer: tree adam vs flat adam on the real model params ---
    import dataclasses

    import optax

    from sei_tpu.models import get_model

    model = get_model(kind="Proposed", architecture="Transformer",
                      task="deblurring", init_input_size=48)
    params = jax.tree_util.tree_map(jnp.asarray, model.params)
    grads = jax.tree_util.tree_map(lambda a: a * 0 + 1e-6, params)

    for label, tx in (("tree adam", optax.adam(1e-4)),
                      ("flat adam", optax.flatten(optax.adam(1e-4)))):
        st = tx.init(params)

        def upd(p, g_, s):
            u, s2 = tx.update(g_, s, p)
            return optax.apply_updates(p, u), s2

        ju = jax.jit(upd)
        p2, s2 = ju(params, grads, st)
        jax.block_until_ready(p2)
        t0 = time.perf_counter()
        for _ in range(30):
            p2, s2 = ju(p2, grads, s2)
        jax.block_until_ready(p2)
        print(f"{label:24s} : {(time.perf_counter()-t0)/30*1000:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
