#!/usr/bin/env python
"""Paired-trajectory summary of the SURE+EI drift twins (VERDICT r2 item 2).

Reads the torch-CPU twin CSV (fully independent stack: torch autograd,
torch.fft physics, grid_sample transform) and the JAX twin CSV (same tiny
config through sei_tpu), and prints the table showing both stacks drifting
with the same shape — the falsification that the drift is an objective
property, not a sei_tpu bug.

    python experiments/drift_compare.py
"""

import csv
import sys


def load(path):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    return {int(r["Epoch"]): float(r["Training Loss"]) for r in rows}


def main():
    torch_csv = sys.argv[1] if len(sys.argv) > 1 else \
        "experiments/evidence/torch_drift_training.csv"
    jax_csv = sys.argv[2] if len(sys.argv) > 2 else \
        "experiments/runs/jax_drift/training.csv"
    t, j = load(torch_csv), load(jax_csv)

    def stats(d, name):
        mn_e = min(d, key=d.get)
        last = max(d)
        print(f"{name:10s} min {d[mn_e]:.3e} @ep{mn_e:3d}   "
              f"final {d[last]:.3e} @ep{last:3d}   "
              f"drift x{d[last] / d[mn_e]:.2f}")
        return mn_e, last

    print("stack      min-loss            final               drift")
    stats(t, "torch")
    stats(j, "jax")
    print()
    print("epoch   torch-loss   jax-loss")
    for e in (25, 50, 100, 150, 200, 250, 300):
        te, je = t.get(e), j.get(e)
        ts = "-" if te is None else f"{te:.3e}"
        js = "-" if je is None else f"{je:.3e}"
        print(f"{e:5d}   {ts:>10}   {js:>10}")


if __name__ == "__main__":
    main()
