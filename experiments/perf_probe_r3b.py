#!/usr/bin/env python
"""Round-3b decomposition probe: where do the 97ms/step go now?

The fused trunk kernel itself is down to fwd 2.78ms / fwd+bwd 7.2ms
(batch 8, 48px, bf16), yet the full proposed step is ~97ms.  This probe
times the layers between: full model fwd, per-part grads, loss branches,
and the non-trunk glue (convs, param stacking, degradation, transforms,
optimizer), with chained inputs (the axon tunnel dedupes identical
executions).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(fn, x, iters=20):
    """Feed each output back as input; returns ms/iter."""
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        x2 = out[0] if isinstance(out, tuple) else out
        # keep shape/dtype: renormalize to input's dtype/shape via lax ops
        out = fn(x2)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from sei_tpu.losses import get_loss
    from sei_tpu.models import get_model
    from sei_tpu.physics import get_physics

    b, s = 8, 48
    physics = get_physics(task="deblurring", kernel="Gaussian_R2", noise_level=5)
    model = get_model(kind="Proposed", architecture="Transformer",
                      task="deblurring", init_input_size=s)
    model.module = dataclasses.replace(model.module, dtype=jnp.bfloat16)
    params = model.params
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((b, 3, s, s), dtype=np.float32))
    key = jax.random.PRNGKey(7)

    apply_fn = model.apply_fn  # (params, x) -> x_hat

    # --- forward-only ---
    f_fwd = jax.jit(lambda xx: apply_fn(params, xx))
    print(f"model fwd b{b}              : {chain_time(f_fwd, x):7.2f} ms", flush=True)

    f_fwd16 = jax.jit(lambda xx: apply_fn(params, jnp.concatenate([xx, xx]))[:b])
    print(f"model fwd b{2*b} (2B SURE) : {chain_time(f_fwd16, x):7.2f} ms", flush=True)

    # --- grads ---
    def sup_loss(p, xx):
        return jnp.mean((apply_fn(p, xx) - xx) ** 2)

    g_sup = jax.jit(lambda xx: (jax.grad(sup_loss)(params, xx), xx))
    out = g_sup(x); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = g_sup(out[1] + 1e-6)
    jax.block_until_ready(out)
    print(f"grad supervised            : {(time.perf_counter()-t0)/20*1000:7.2f} ms", flush=True)

    # --- loss branches ---
    y = physics.degrade(x, key)

    for method, label in (("sure", "grad SURE"), ("proposed", "grad proposed")):
        loss = get_loss(method=method, physics=physics, noise_level=5)

        def lf(p, yy, kk):
            return loss(kk, x, yy, lambda im: apply_fn(p, im))

        gl = jax.jit(lambda yy, kk: (jax.grad(lf)(params, yy, kk), yy))
        out = gl(y, key); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(20):
            out = gl(out[1] + 1e-6, jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        print(f"{label:26s} : {(time.perf_counter()-t0)/20*1000:7.2f} ms", flush=True)

    # --- unfused comparison ---
    os.environ["SEI_FUSED_TRUNK"] = "0"
    model2 = get_model(kind="Proposed", architecture="Transformer",
                       task="deblurring", init_input_size=s)
    model2.module = dataclasses.replace(model2.module, dtype=jnp.bfloat16)
    f_unf = jax.jit(lambda xx: model2.apply_fn(params, xx))
    print(f"model fwd b{b} UNFUSED      : {chain_time(f_unf, x):7.2f} ms", flush=True)
    del os.environ["SEI_FUSED_TRUNK"]


if __name__ == "__main__":
    main()
