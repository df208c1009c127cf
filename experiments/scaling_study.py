#!/usr/bin/env python
"""1->8 virtual-device scaling of the sharded train step (verdict item 10).

CPU-only, relative scaling: the batch is sharded over a 1/2/4/8-device
virtual mesh (XLA_FLAGS=--xla_force_host_platform_device_count) and the
SAME global-batch proposed-method step is timed.  Run via:

    python experiments/scaling_study.py          # spawns one subprocess per N
    python experiments/scaling_study.py --n 4    # one measurement (internal)
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(n_dev: int, steps: int = 8, weak: bool = False) -> float:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from sei_tpu.data import DeviceDataCache
    from sei_tpu.losses import get_loss
    from sei_tpu.models import get_model
    from sei_tpu.parallel import make_mesh
    from sei_tpu.physics import get_physics
    from sei_tpu.train.trainer import Trainer

    assert len(jax.devices()) == n_dev, jax.devices()
    physics = get_physics(task="deblurring", kernel="Gaussian_R2", noise_level=5)
    # small SwinIR so an 8-step CPU measurement completes quickly; the
    # sharding layout (batch over the data axis, replicated params, psum
    # grads) is identical to the flagship config
    from sei_tpu.models import Model
    from sei_tpu.models.swinir import SwinIR

    module = SwinIR(img_size=48, embed_dim=24, depths=(2, 2),
                    num_heads=(2, 2), window_size=8, mlp_ratio=2.0,
                    drop_path_rate=0.1, upsampler=None)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 3, 48, 48)))["params"]
    model = Model(module=module, params=params, kind="Proposed",
                  architecture="Transformer")
    loss_fn = get_loss(method="proposed", physics=physics, noise_level=5)

    # weak scaling: fixed per-device batch (the meaningful mode on a host
    # with ONE physical core, where virtual devices timeshare - constant
    # throughput there means the sharded program adds no per-device
    # overhead; real chips then scale the constant by n)
    n_img, batch = 32, (4 * n_dev if weak else 16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n_img, 3, 96, 96), dtype=np.float32))
    key = jax.random.PRNGKey(0)
    y = jax.jit(
        jax.vmap(lambda im, i: physics.randomly_degrade(im[None], key, seed=i)[0])
    )(x, jnp.arange(n_img))
    cache = DeviceDataCache(
        x=x, y=y, heights=jnp.full((n_img,), 96, jnp.int32),
        widths=jnp.full((n_img,), 96, jnp.int32), ids=jnp.arange(n_img), rate=1,
    )
    trainer = Trainer(model=model, loss_fn=loss_fn, physics=physics,
                      cache=cache, batch_size=batch, epochs=1, lr=1e-4,
                      crop_size=96, out_dir=None, mesh=make_mesh())
    state = trainer.init_state()
    step = trainer._get_step(0)
    state, loss = step(state, cache, trainer.base_key)
    jax.block_until_ready(loss)
    t0 = time.time()
    for _ in range(steps):
        state, loss = step(state, cache, trainer.base_key)
    jax.block_until_ready(loss)
    dt = time.time() - t0
    return batch * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--weak", action="store_true")
    args = ap.parse_args()
    if args.n is not None:
        print(json.dumps({"n": args.n,
                          "img_per_sec": measure(args.n, weak=args.weak)}))
        return
    results = {}
    for n in (1, 2, 4, 8):
        cmd = [sys.executable, os.path.abspath(__file__), "--n", str(n)]
        if "--weak" in sys.argv:
            cmd.append("--weak")
        out = subprocess.run(
            cmd,
            capture_output=True, text=True, cwd=REPO,
            env={**os.environ, "PYTHONPATH": f"/root/.axon_site:{REPO}"},
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"n={n} FAILED:\n{out.stdout[-500:]}\n{out.stderr[-1000:]}")
            continue
        r = json.loads(line[-1])
        results[n] = r["img_per_sec"]
        base = results.get(1, r["img_per_sec"])
        print(f"n={n}: {r['img_per_sec']:.2f} img/s  "
              f"(scaling x{r['img_per_sec'] / base:.2f})", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
