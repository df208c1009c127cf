#!/usr/bin/env python
"""Export the frozen (x, y) measurement cache to .npz for the torch twin.

The SURE+EI drift falsification (VERDICT r2 item 2) trains the SAME frozen
measurements through two independent stacks (sei_tpu/JAX and the torch twin
in torch_drift_twin.py); exporting the device cache removes all data/noise
randomness from the comparison.

Usage: python experiments/export_cache_npz.py [n_images] [out.npz]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out = sys.argv[2] if len(sys.argv) > 2 else "experiments/drift_cache.npz"

    from sei_tpu.data import GroundTruthDataset, build_device_cache
    from sei_tpu.physics import get_physics

    physics = get_physics(task="deblurring", kernel="Gaussian_R2", noise_level=5)
    gt = GroundTruthDataset("div2k", datasets_dir="./datasets", split="train",
                            size=256)
    # subset: monkey-limit the source length (first n_images ids unchanged)
    if n_images < len(gt):
        src = gt.source
        src_len = src.__class__.__len__
        gt.source.__class__ = type(
            src.__class__.__name__ + "Sub", (src.__class__,),
            {"__len__": lambda self: n_images},
        )
    cache = build_device_cache(
        gt, physics, base_key=jax.random.PRNGKey(0),
        storage_dtype=np.float32,
    )
    np.savez_compressed(
        out,
        x=np.asarray(cache.x, np.float32),
        y=np.asarray(cache.y, np.float32),
        heights=np.asarray(cache.heights),
        widths=np.asarray(cache.widths),
        ids=np.asarray(cache.ids),
    )
    print(f"wrote {out}: x{cache.x.shape} y{cache.y.shape}")


if __name__ == "__main__":
    main()
