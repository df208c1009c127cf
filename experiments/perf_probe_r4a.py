"""r4a: optimizer-update cost on the real SwinIR tree (the ~9.7 ms suspect).

r3h measured flat Adam at 9.7 ms/step vs ~0.5 ms HBM roofline for an
11.9M-param Adam (read g,p,m,v + write p,m,v = 333 MB @ 819 GB/s).  Legs:

  A. optax.flatten(optax.adam)          -- current trainer default
  B. optax.adam (tree form)             -- r3h's 17.7 ms reference point
  C. hand-fused flat adam               -- ravel_pytree + one jnp elementwise
                                           chain on a single vector + unravel

Methodology (STATUS r3 lessons): chained state (inputs differ per call, so
the tunnel's dedupe-replay can't fire), fresh closures per leg, donated
state, block_until_ready around the timed loop.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree

os.makedirs("/root/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")

from sei_tpu.models import get_model

LR = 1e-4
ITERS = 100


def make_tree():
    model = get_model(kind="Proposed", architecture="Transformer",
                      task="deblurring", init_input_size=48)
    params = jax.tree_util.tree_map(jnp.asarray, model.params)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n/1e6:.1f}M, {len(jax.tree_util.tree_leaves(params))} leaves")
    key = jax.random.PRNGKey(0)
    grads = jax.tree_util.tree_map(
        lambda x: 1e-3 * jax.random.normal(jax.random.fold_in(key, x.size), x.shape, x.dtype),
        params,
    )
    return params, grads


def time_optax(tag, tx, params, grads):
    state0 = tx.init(params)

    def step(params, state, grads):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        return params, state

    step.__name__ = f"step_{tag}"
    fn = jax.jit(step, donate_argnums=(0, 1))
    p, s = fn(params, state0, grads)  # compile
    jax.block_until_ready(p)
    t0 = time.time()
    for _ in range(ITERS):
        p, s = fn(p, s, grads)
    jax.block_until_ready(p)
    dt = (time.time() - t0) / ITERS * 1e3
    print(f"{tag}: {dt:.3f} ms/update")
    return dt


def time_fused_flat(params, grads):
    g_flat, unravel = ravel_pytree(grads)
    p_flat, _ = ravel_pytree(params)
    b1, b2, eps = 0.9, 0.999, 1e-8

    def step(p_tree, m, v, t, g_tree):
        g = ravel_pytree(g_tree)[0]
        p = ravel_pytree(p_tree)[0]
        t = t + 1
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * (g * g)
        c1 = 1 - b1 ** t.astype(jnp.float32)
        c2 = 1 - b2 ** t.astype(jnp.float32)
        p = p - LR * (m / c1) / (jnp.sqrt(v / c2) + eps)
        return unravel(p), m, v, t

    fn = jax.jit(step, donate_argnums=(0, 1, 2, 3))
    m = jnp.zeros_like(p_flat)
    v = jnp.zeros_like(p_flat)
    t = jnp.zeros((), jnp.int32)
    p, m, v, t = fn(params, m, v, t, grads)
    jax.block_until_ready(p)
    t0 = time.time()
    for _ in range(ITERS):
        p, m, v, t = fn(p, m, v, t, grads)
    jax.block_until_ready(p)
    dt = (time.time() - t0) / ITERS * 1e3
    print(f"fused_flat: {dt:.3f} ms/update")
    return dt


def time_fused_flatstate(params, grads):
    """Like C but params ALSO live flat between steps (unravel only for the
    model would happen inside the train step; here we measure pure update)."""
    g_flat, _ = ravel_pytree(grads)
    p_flat, _ = ravel_pytree(params)
    b1, b2, eps = 0.9, 0.999, 1e-8

    def step(p, m, v, t, g):
        t = t + 1
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * (g * g)
        c1 = 1 - b1 ** t.astype(jnp.float32)
        c2 = 1 - b2 ** t.astype(jnp.float32)
        p = p - LR * (m / c1) / (jnp.sqrt(v / c2) + eps)
        return p, m, v, t

    fn = jax.jit(step, donate_argnums=(0, 1, 2, 3))
    m = jnp.zeros_like(p_flat)
    v = jnp.zeros_like(p_flat)
    t = jnp.zeros((), jnp.int32)
    p = p_flat
    p, m, v, t = fn(p, m, v, t, g_flat)
    jax.block_until_ready(p)
    t0 = time.time()
    for _ in range(ITERS):
        p, m, v, t = fn(p, m, v, t, g_flat)
    jax.block_until_ready(p)
    dt = (time.time() - t0) / ITERS * 1e3
    print(f"fused_flatstate (pure vector update): {dt:.3f} ms/update")
    return dt


def copy_tree(t):
    return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), t)


if __name__ == "__main__":
    params, grads = make_tree()
    time_optax("flatten(adam)", optax.flatten(optax.adam(LR)),
               copy_tree(params), copy_tree(grads))
    time_optax("adam(tree)", optax.adam(LR), copy_tree(params), copy_tree(grads))
    time_fused_flat(copy_tree(params), copy_tree(grads))
    time_fused_flatstate(copy_tree(params), copy_tree(grads))
