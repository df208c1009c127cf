#!/usr/bin/env python
"""JAX-side half of the drift falsification pair (see torch_drift_twin.py).

Trains the proposed method (SURE+EI) with the Convolutional architecture on
the SAME frozen measurement cache the torch twin uses, through the production
sei_tpu trainer.  Comparing the two training.csv trajectories decides whether
the late-training drift is a property of the objective on dead-leaves data or
an artifact of the JAX stack.

Usage:
  python experiments/jax_drift_run.py --cache experiments/drift_cache.npz \
      --epochs 300 --out experiments/runs/jax_drift
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="experiments/drift_cache.npz")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--scales", type=int, default=5)
    ap.add_argument("--out", default="experiments/runs/jax_drift")
    args = ap.parse_args()

    from sei_tpu.data import DeviceDataCache
    from sei_tpu.losses import get_loss
    from sei_tpu.models import get_model
    from sei_tpu.physics import get_physics
    from sei_tpu.train.trainer import Trainer

    data = np.load(args.cache)
    cache = DeviceDataCache(
        x=jnp.asarray(data["x"]),
        y=jnp.asarray(data["y"]),
        heights=jnp.asarray(data["heights"]),
        widths=jnp.asarray(data["widths"]),
        ids=jnp.asarray(data["ids"]),
        rate=1,
    )
    physics = get_physics(task="deblurring", kernel="Gaussian_R2", noise_level=5)
    model = get_model(
        kind="Proposed", architecture="Convolutional", task="deblurring",
        conv_blueprint={"hidden_channels": args.hidden, "scales": args.scales},
        init_input_size=48,
    )
    loss_fn = get_loss(method="proposed", physics=physics, noise_level=5,
                       crop_size=48)
    trainer = Trainer(
        model=model, loss_fn=loss_fn, physics=physics, cache=cache,
        batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
        crop_size=args.crop, out_dir=args.out, checkpoint_interval=50,
    )
    _, stats = trainer.train()
    print(stats)


if __name__ == "__main__":
    main()
