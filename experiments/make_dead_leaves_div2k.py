#!/usr/bin/env python
"""Generate a Div2K-layout dataset of dead-leaves images (+ real-photo val).

No-egress stand-in for Div2K (ref src/datasets/div2k.py layout:
DIV2K/DIV2K_{train,valid}_HR/{index:04d}.png) so the FULL training/eval CLI
path runs verbatim: `--dataset div2k --GroundTruthDataset__datasets_dir <out>`.

Dead leaves (Matheron '68; Lee/Mumford/Huang '01) are the standard synthetic
model of natural-image statistics: occluding disks with a power-law radius
distribution p(r) ~ r^-3 produce scale-invariant ~1/f^2 power spectra and
occlusion edges — exactly the structure a scale-equivariant self-supervised
loss must recover, making this the right data for reproducing the paper's
method ordering (BASELINE.md) without Div2K itself.

Images are synthesized at 2x the pipeline's 256px working size; the
GroundTruthDataset shorter-side-256 antialiased resize then yields naturally
antialiased edges, as with downsampled camera images.  Colors are drawn from
a real photograph's palette (matplotlib's public grace_hopper.jpg) so channel
statistics are photographic.  A few real-photo crops are appended to the val
split as a realism check.
"""

import argparse
import os
from multiprocessing import Pool

import numpy as np
from PIL import Image

HOPPER = "/opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/sample_data/grace_hopper.jpg"


def load_palette():
    im = np.asarray(Image.open(HOPPER).convert("RGB"), dtype=np.float32) / 255.0
    return im.reshape(-1, 3)


def dead_leaves(rng, h, w, palette, rmin=4.0, rmax=120.0, max_disks=6000):
    """Paint front-to-back (topmost first) until fully covered."""
    img = np.zeros((h, w, 3), np.float32)
    covered = np.zeros((h, w), bool)
    n_left = h * w
    # p(r) ~ r^-3 via inverse-CDF sampling
    u = rng.random(max_disks)
    a, b = rmin ** -2.0, rmax ** -2.0
    radii = (a + u * (b - a)) ** -0.5
    cx = rng.uniform(0, w, max_disks)
    cy = rng.uniform(0, h, max_disks)
    colors = palette[rng.integers(0, len(palette), max_disks)]
    # mild per-leaf linear shading so regions aren't perfectly flat
    grad_dir = rng.standard_normal((max_disks, 2)).astype(np.float32)
    grad_amp = rng.uniform(0.0, 0.15, max_disks).astype(np.float32)

    for i in range(max_disks):
        r = radii[i]
        x0, x1 = max(int(cx[i] - r), 0), min(int(cx[i] + r) + 2, w)
        y0, y1 = max(int(cy[i] - r), 0), min(int(cy[i] + r) + 2, h)
        if x0 >= x1 or y0 >= y1:
            continue
        yy, xx = np.mgrid[y0:y1, x0:x1]
        inside = (xx - cx[i]) ** 2 + (yy - cy[i]) ** 2 <= r * r
        free = inside & ~covered[y0:y1, x0:x1]
        if not free.any():
            continue
        shade = 1.0 + grad_amp[i] * (
            grad_dir[i, 0] * (xx - cx[i]) + grad_dir[i, 1] * (yy - cy[i])
        ) / max(r, 1.0)
        leaf = np.clip(colors[i][None, None, :] * shade[..., None], 0.0, 1.0)
        patch = img[y0:y1, x0:x1]
        patch[free] = leaf[free]
        covered[y0:y1, x0:x1] |= inside
        n_left -= int(free.sum())
        if n_left <= 0:
            break
    if n_left > 0:  # pathological tail: fill leftovers with the palette mean
        img[~covered] = palette.mean(axis=0)
    return img


def save_png(path, img):
    Image.fromarray(
        np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    ).save(path)


def hopper_val_crops(n=4, size=512):
    im = np.asarray(Image.open(HOPPER).convert("RGB"), dtype=np.float32) / 255.0
    h, w = im.shape[:2]
    rng = np.random.default_rng(123)
    crops = []
    for _ in range(n):
        y = rng.integers(0, max(h - size, 1))
        x = rng.integers(0, max(w - size, 1))
        crops.append(im[y : y + size, x : x + size])
    return crops


def _make_one(job):
    path, seed, h, w = job
    if os.path.exists(path):
        return
    palette = load_palette()
    rng = np.random.default_rng(seed)
    save_png(path, dead_leaves(rng, h, w, palette))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="datasets_dir root")
    ap.add_argument("--n_train", type=int, default=800)
    ap.add_argument("--n_val", type=int, default=100)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 8)
    args = ap.parse_args()

    train_dir = os.path.join(args.out, "DIV2K", "DIV2K_train_HR")
    val_dir = os.path.join(args.out, "DIV2K", "DIV2K_valid_HR")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(val_dir, exist_ok=True)

    hopper = hopper_val_crops(n=4)
    jobs = []
    for i in range(args.n_train):
        p = os.path.join(train_dir, f"{i + 1:04d}.png")
        jobs.append((p, args.seed * 1_000_003 + i, args.height, args.width))
    for j in range(args.n_val):
        p = os.path.join(val_dir, f"{801 + j:04d}.png")
        if j < len(hopper):  # real-photo realism check at the head of val
            if not os.path.exists(p):
                save_png(p, hopper[j])
            continue
        jobs.append((p, args.seed * 1_000_003 + 10_000 + j, args.height, args.width))

    with Pool(args.workers) as pool:
        for k, _ in enumerate(pool.imap_unordered(_make_one, jobs, chunksize=4)):
            if (k + 1) % 100 == 0:
                print(f"{k + 1}/{len(jobs)}", flush=True)
    print("done:", args.out, flush=True)


if __name__ == "__main__":
    main()
