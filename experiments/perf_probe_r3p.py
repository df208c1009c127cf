#!/usr/bin/env python
"""Round-3p probe: per-pallas-call fixed overhead (dedup-proof).

Chain N trivial copy kernels inside one jit; input perturbed by a distinct
scalar per call so the tunnel can't dedup. Slope of time vs N = per-call
cost. Also: one kernel with grid=(24,) vs 24 kernels with grid=(1,) to
separate per-call from per-grid-step cost, and an XLA-op control chain.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

os.makedirs("/root/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")

b, h, w, c = 8, 48, 48, 180


def timeit(fn, x, iters=20, windows=3):
    ts = [jnp.float32(i) for i in range(iters * windows + 1)]
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


def copy_kernel(x_ref, y_ref):
    y_ref[...] = x_ref[...] + 1.0


def one_copy(xx, steps):
    gsz = b // steps if steps <= b else b
    return pl.pallas_call(
        copy_kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec((gsz, h, w, c), lambda i: (i % (b // gsz), 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((gsz, h, w, c), lambda i: (i % (b // gsz), 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xx.shape, xx.dtype),
    )(xx)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)

    def mk(n_calls, steps):
        def fn(xx, t):
            xx = xx * (1 + t * 1e-6).astype(xx.dtype)
            for _ in range(n_calls):
                xx = one_copy(xx, steps)
            return xx
        return jax.jit(fn)

    for n_calls in (1, 2, 6, 12, 24):
        ms = timeit(mk(n_calls, 4), x)
        print(f"{n_calls:3d} copy kernels grid=(4,)      : {ms:7.2f} ms",
              flush=True)
    ms = timeit(mk(1, 24), x)
    print(f"  1 copy kernel  grid=(24,)     : {ms:7.2f} ms", flush=True)
    ms = timeit(mk(6, 1), x)
    print(f"  6 copy kernels grid=(1,)      : {ms:7.2f} ms", flush=True)

    # XLA control: 24 chained adds (no pallas)
    def xla_chain(xx, t):
        xx = xx * (1 + t * 1e-6).astype(xx.dtype)
        for _ in range(24):
            xx = xx + 1.0
        return xx
    ms = timeit(jax.jit(xla_chain), x)
    print(f" 24 XLA adds (control)          : {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
