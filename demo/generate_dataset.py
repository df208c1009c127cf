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
    # The reference takes positional image_dir/out_dir
    # (ref demo/generate_dataset.py:22-23); accept both spellings.
    parser.add_argument("image_dir", type=str, nargs="?", default=None)
    parser.add_argument("out_dir_pos", type=str, nargs="?", default=None,
                        metavar="out_dir")
    parser.add_argument("--in_dir", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default=None)
    args = parser.parse_args()
    args.in_dir = args.in_dir or args.image_dir
    args.out_dir = args.out_dir or args.out_dir_pos
    if not args.in_dir or not args.out_dir:
        parser.error("need image_dir and out_dir (positional or --in_dir/--out_dir)")

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
