#!/usr/bin/env python
"""Round-2 perf probe: where do the 260ms/step go?

Sweeps scan_steps (dispatch amortization), donation, and batch size on the
real chip; prints ms/step and img/s for each config.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def build(batch, scan_steps, donate, bf16=True):
    from sei_tpu.data import DeviceDataCache
    from sei_tpu.losses import get_loss
    from sei_tpu.models import get_model
    from sei_tpu.physics import get_physics
    from sei_tpu.train.trainer import Trainer

    physics = get_physics(task="deblurring", kernel="Gaussian_R2", noise_level=5)
    model = get_model(kind="Proposed", architecture="Transformer",
                      task="deblurring", init_input_size=48)
    if bf16:
        model.module = dataclasses.replace(model.module, dtype=jnp.bfloat16)
    loss_fn = get_loss(method="proposed", physics=physics, noise_level=5)

    n_img = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n_img, 3, 256, 256), dtype=np.float32))
    key = jax.random.PRNGKey(0)
    y = jax.jit(
        jax.vmap(lambda im, i: physics.randomly_degrade(im[None], key, seed=i)[0])
    )(x, jnp.arange(n_img))
    cache = DeviceDataCache(
        x=x, y=y,
        heights=jnp.full((n_img,), 256, jnp.int32),
        widths=jnp.full((n_img,), 256, jnp.int32),
        ids=jnp.arange(n_img), rate=1,
    )
    trainer = Trainer(
        model=model, loss_fn=loss_fn, physics=physics, cache=cache,
        batch_size=batch, epochs=1, lr=1e-4, crop_size=256, out_dir=None,
        scan_steps=scan_steps, donate=donate,
    )
    state = trainer.init_state()
    step = trainer._get_step(0)
    return trainer, state, step, cache


def bench_config(name, batch, scan_steps, donate, iters=None, bf16=True):
    trainer, state, step, cache = build(batch, scan_steps, donate, bf16)
    # warmup/compile
    t0 = time.time()
    state, loss = step(state, cache, trainer.base_key)
    jax.block_until_ready(loss)
    compile_s = time.time() - t0
    if iters is None:
        iters = max(1, 40 // scan_steps)
    t0 = time.time()
    for _ in range(iters):
        state, loss = step(state, cache, trainer.base_key)
    jax.block_until_ready(loss)
    dt = time.time() - t0
    n_steps = iters * scan_steps
    ms = dt / n_steps * 1000
    print(f"{name:40s} {ms:8.1f} ms/step  {batch * n_steps / dt:7.1f} img/s"
          f"  (compile {compile_s:.0f}s)", flush=True)
    del trainer, state, step, cache
    return ms


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "scan"
    if which == "scan":
        bench_config("b8 scan=1 donate=off (current)", 8, 1, False)
        bench_config("b8 scan=8 donate=off", 8, 8, False)
        bench_config("b8 scan=8 donate=on", 8, 8, True)
    elif which == "donate":
        bench_config("b8 scan=1 donate=on", 8, 1, True)
    elif which == "batch":
        bench_config("b16 scan=4 donate=off", 16, 4, False)
        bench_config("b32 scan=2 donate=off", 32, 2, False)
