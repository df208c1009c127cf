#!/usr/bin/env python
"""Offline degradation CLI (parity: ref demo/generate_dataset.py:21-40).

Applies physics (A + fresh noise) to every PNG in a directory and writes the
degraded copies.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sei_tpu.config import DefaultArgParser
from sei_tpu.data import FolderDataset, write_image
from sei_tpu.physics import get_physics


def main():
    parser = DefaultArgParser()
    parser.add_argument("--in_dir", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    args = parser.parse_args()

    physics = get_physics(
        task=args.task,
        noise_level=args.noise_level,
        kernel=args.kernel,
        sr_factor=args.sr_factor,
        physics_v2=args.physics_v2,
    )

    src = FolderDataset(args.in_dir)
    key = jax.random.PRNGKey(0)
    degrade = jax.jit(physics.degrade)
    for i in range(len(src)):
        x = src.load(i)
        assert x.shape[0] == 3, f"unexpected channels: {x.shape[0]}"
        key, sub = jax.random.split(key)
        y = degrade(jnp.asarray(x)[None], sub)[0]
        write_image(os.path.join(args.out_dir, src.basename(i)), np.asarray(y))
    print(f"wrote {len(src)} degraded images to {args.out_dir}")


if __name__ == "__main__":
    main()
