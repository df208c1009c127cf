#!/usr/bin/env python
"""Decompose the 260ms proposed step: fwd, fwd+bwd, SURE, proposed.

Chained-input timing with the chain perturbation INSIDE the jitted function
(one dispatch per iteration; eager per-iter ops cost ~20ms each through the
axon relay and poison naive measurements).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(name, step, x0, iters=20):
    """step: jitted x -> x (same shape), includes the real work + chain."""
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.time()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:46s} {dt:8.1f} ms", flush=True)
    return dt


def main():
    from sei_tpu.losses import get_loss
    from sei_tpu.models import get_model
    from sei_tpu.physics import get_physics

    physics = get_physics(task="deblurring", kernel="Gaussian_R2", noise_level=5)
    model = get_model(kind="Proposed", architecture="Transformer",
                      task="deblurring", init_input_size=48)
    model.module = dataclasses.replace(model.module, dtype=jnp.bfloat16)
    params = model.params
    apply_fn = model.apply_fn

    rng = np.random.default_rng(0)
    y8 = jnp.asarray(rng.random((8, 3, 48, 48), dtype=np.float32))
    x8 = jnp.asarray(rng.random((8, 3, 48, 48), dtype=np.float32))
    key = jax.random.PRNGKey(0)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "fwd"):
        @jax.jit
        def fwd_step(y):
            out = apply_fn(params, y, train=True, rng=key)
            return y8 + 1e-6 * out  # chain

        chain_time("fwd b8 train (drop_path+dropout rng)", fwd_step, y8)

        @jax.jit
        def fwd_eval_step(y):
            out = apply_fn(params, y, train=False)
            return y8 + 1e-6 * out

        chain_time("fwd b8 eval (deterministic)", fwd_eval_step, y8)

        y16 = jnp.asarray(rng.random((16, 3, 48, 48), dtype=np.float32))

        @jax.jit
        def fwd16(y):
            out = apply_fn(params, y, train=True, rng=key)
            return y16 + 1e-6 * out

        chain_time("fwd b16 train", fwd16, y16)

    if which in ("all", "bwd"):
        def make_grad_step(loss_fn, y0):
            @jax.jit
            def g(y):
                grads = jax.grad(loss_fn)(params, y)
                s = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
                    grads, jnp.float32(0))
                return y0 + 1e-12 * s
            return g

        def sup_loss(p, y):
            out = apply_fn(p, y, train=True, rng=key)
            return jnp.mean((out - x8) ** 2)

        chain_time("grad supervised b8 (1 fwd + bwd)",
                   make_grad_step(sup_loss, y8), y8, iters=10)

        loss_sure = get_loss(method="sure", physics=physics, noise_level=5,
                             crop_training_pairs=False)

        def sure_l(p, y):
            f = lambda img: apply_fn(p, img, train=True, rng=key)
            return loss_sure(key, x8, y, f)

        chain_time("grad SURE b8 (one 2B fwd + bwd)",
                   make_grad_step(sure_l, y8), y8, iters=10)

        loss_prop = get_loss(method="proposed", physics=physics, noise_level=5,
                             crop_training_pairs=False)

        def prop_l(p, y):
            f = lambda img: apply_fn(p, img, train=True, rng=key)
            return loss_prop(key, x8, y, f)

        chain_time("grad proposed b8 (2B fwd + B fwd + bwd)",
                   make_grad_step(prop_l, y8), y8, iters=10)


if __name__ == "__main__":
    main()
