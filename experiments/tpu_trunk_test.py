#!/usr/bin/env python
"""Fused-trunk TPU validation: compile, numerics vs unfused, and timing."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sei_tpu.models import get_model

    rng = np.random.default_rng(0)
    IMG = int(os.environ.get("IMG", "48"))
    y8 = jnp.asarray(rng.random((8, 3, IMG, IMG), dtype=np.float32))
    key = jax.random.PRNGKey(0)

    model = get_model(kind="Proposed", architecture="Transformer",
                      task="deblurring", init_input_size=48)
    bf16 = os.environ.get("TRUNK_BF16", "1") != "0"
    if bf16:
        model.module = dataclasses.replace(model.module, dtype=jnp.bfloat16)
    params = model.params

    def apply_with(fused, p, y, train=True):
        m = dataclasses.replace(model.module, fused_trunk=fused)
        rngs = {"dropout": key} if train else None
        return m.apply({"params": p}, y, not train,
                       rngs=rngs) if False else m.apply(
            {"params": p}, y, not train, rngs=rngs)

    # NOTE deterministic=not train? SwinIR __call__(x, deterministic)
    def fwd(fused, p, y):
        m = dataclasses.replace(model.module, fused_trunk=fused)
        return m.apply({"params": p}, y, True)  # deterministic: no dpm rng

    f_unf = jax.jit(lambda p, y: fwd(False, p, y))
    f_fus = jax.jit(lambda p, y: fwd(True, p, y))

    t0 = time.time()
    a = f_unf(params, y8); jax.block_until_ready(a)
    print(f"unfused fwd compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    b = f_fus(params, y8); jax.block_until_ready(b)
    print(f"fused fwd compile {time.time()-t0:.0f}s", flush=True)
    d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
    print(f"fwd max|diff| = {d.max():.3e}  mean = {d.mean():.3e}", flush=True)

    # grads
    tgt = jnp.asarray(rng.random((8, 3, IMG, IMG), dtype=np.float32))

    def loss(fused):
        def f(p, y):
            out = fwd(fused, p, y)
            return jnp.mean((out.astype(jnp.float32) - tgt) ** 2)
        return jax.jit(jax.grad(f))

    t0 = time.time()
    ga = loss(False)(params, y8); jax.block_until_ready(ga)
    print(f"unfused grad compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    gb = loss(True)(params, y8); jax.block_until_ready(gb)
    print(f"fused grad compile {time.time()-t0:.0f}s", flush=True)
    rel = []
    for la, lb in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        la = np.asarray(la, np.float32); lb = np.asarray(lb, np.float32)
        denom = np.abs(la).max() + 1e-8
        rel.append(np.abs(la - lb).max() / denom)
    print(f"grad max rel diff over leaves = {max(rel):.3e}", flush=True)

    # timing (chained)
    def chain(f, y0, iters=20):
        x = f(params, y0); jax.block_until_ready(x)
        t0 = time.time()
        for _ in range(iters):
            x = f(params, y0 + 1e-6 * x[..., :1, :1].mean() if False else y0)
            # chain via jitted perturbation instead:
        jax.block_until_ready(x)
        return (time.time() - t0) / iters * 1000

    @jax.jit
    def step_unf(y):
        return y8 + 1e-6 * fwd(False, params, y)

    @jax.jit
    def step_fus(y):
        return y8 + 1e-6 * fwd(True, params, y)

    for name, st in (("unfused", step_unf), ("fused", step_fus)):
        x = st(y8); jax.block_until_ready(x)
        t0 = time.time()
        for _ in range(20):
            x = st(x)
        jax.block_until_ready(x)
        print(f"{name} fwd b8: {(time.time()-t0)/20*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
