#!/usr/bin/env python
"""Torch-autograd twin of the proposed-method training loop (drift probe).

VERDICT r2 item 2: SURE+EI training on dead-leaves data drifts upward past
~epoch 50 at reference hyperparameters in the sei_tpu/JAX stack.  To decide
whether that is a loss-landscape property of the data or a latent bug in the
JAX implementation, this script trains the SAME frozen measurements (exported
by export_cache_npz.py) with the SAME method recipe through a fully
independent stack: torch CPU autograd, torch.fft physics, torch grid_sample
for the scaling transform, and a torch transcription of the reference's
Convolutional architecture spec (ref src/models/convolutional.py; ConvNeXt
blocks + ideal spectral resampling).  If this twin's loss drifts on the same
trajectory, the drift is a property of the objective on this data; if it
stays flat while the JAX run drifts, the JAX stack is implicated.

Method recipe (ref src/losses/__init__.py:67-142 + sure.py:48-66):
  loss = SURE + 1.0 * EI(scaling, stop-grad)
  SURE: ||A f(y) - y||^2_margin + 2 s^2 mean_margin(b (A f(y+tau b) - A f(y))/tau)
        - s^2/B,  tau 1e-2, margin (13-1)//2 = 6 (Gaussian_R2), cropped div
  EI:   x2 = stopgrad(T(f(y))); x3 = f(A(x2)); + mse(x3, x2)
  T:    per-image rate in {0.75, 0.5} (floor(2U) index), center ~ U[-1,1]^2,
        grid g = (v - c)/rate + c, v = 2/n * a - 1, bicubic grid_sample,
        reflection padding, align_corners=True (ref src/transforms.py:27-109)
Optimizer: Adam lr 1e-4 betas (0.9, 0.999); delayed_linear_decay schedule
(constant for epochs/2 then linear to 1e-2x; ref src/scheduler.py:14-21).
Batching: per-epoch permutation, aligned random 256-crop per image, then a
per-image random 48-crop before the loss (matching the sei_tpu trainer).

Usage:
  python experiments/torch_drift_twin.py --cache experiments/drift_cache.npz \
      --epochs 300 --out experiments/runs/torch_drift
"""

import argparse
import csv
import math
import os
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# physics: circular FFT blur with the Gaussian_R2 PSF
# ---------------------------------------------------------------------------


def gaussian_kernel(sigma: float = 2.0) -> torch.Tensor:
    """size 6*sigma+1, normalized, float64 -> float32 (ref src/physics/
    kernels.py:13-28 formula)."""
    size = int(6 * sigma + 1)
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(ax**2) / (2 * sigma**2))
    k2 = np.outer(g, g)
    k2 /= k2.sum()
    return torch.tensor(k2, dtype=torch.float32)


class FFTBlur:
    """y = irfft2(rfft2(x) * OTF); OTF from the PSF rolled to the origin
    (ref src/physics/blur/__init__.py:205-223 recipe)."""

    def __init__(self, kernel: torch.Tensor, shape):
        h, w = shape
        kh, kw = kernel.shape
        pad = torch.zeros(h, w)
        pad[:kh, :kw] = kernel
        pad = torch.roll(pad, (-(kh // 2), -(kw // 2)), dims=(0, 1))
        self.otf = torch.fft.rfft2(pad)[None, None]

    def A(self, x):
        return torch.fft.irfft2(torch.fft.rfft2(x) * self.otf, s=x.shape[-2:])


# ---------------------------------------------------------------------------
# the Convolutional architecture (torch transcription of the ref spec)
# ---------------------------------------------------------------------------


class ChannelLN(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.ln = nn.LayerNorm(ch, eps=1e-6)

    def forward(self, x):  # NCHW
        return self.ln(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)


class ConvBlock(nn.Module):
    """7x7 depthwise -> channel LN -> 1x1 x4 -> GELU -> 1x1, residual."""

    def __init__(self, dim):
        super().__init__()
        self.dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.ln = ChannelLN(dim)
        self.fc1 = nn.Conv2d(dim, 4 * dim, 1)
        self.fc2 = nn.Conv2d(4 * dim, dim, 1)

    def forward(self, x):
        h = self.dw(x)
        h = self.ln(h)
        h = F.gelu(self.fc1(h))
        return x + self.fc2(h)


def ideal_resample(x, rate):
    """Ideal spectral resample (full fft2 -> centered crop/pad -> ifft2.real),
    energy-scaled so constants stay constant."""
    b, c, h, w = x.shape
    if rate >= 1:
        oh, ow = h * int(rate), w * int(rate)
    else:
        r = int(round(1 / rate))
        oh, ow = h // r, w // r
    xf = torch.fft.fftshift(torch.fft.fft2(x), dim=(-2, -1))
    if oh > h or ow > w:
        ph0, pw0 = (oh - h) // 2, (ow - w) // 2
        xf = F.pad(xf, (pw0, ow - w - pw0, ph0, oh - h - ph0))
    if oh < h or ow < w:
        ch0, cw0 = (h - oh) // 2, (w - ow) // 2
        xf = xf[..., ch0 : ch0 + oh, cw0 : cw0 + ow]
    out = torch.fft.ifft2(torch.fft.ifftshift(xf, dim=(-2, -1))).real
    return out * (oh * ow) / (h * w)


class SpectralDown(nn.Module):
    def __init__(self, ch, rate=2):
        super().__init__()
        self.ln = ChannelLN(ch)
        self.proj = nn.Conv2d(ch, ch * rate**2, 1)
        self.rate = rate

    def forward(self, x):
        return ideal_resample(self.proj(self.ln(x)), 1.0 / self.rate)


class SpectralUp(nn.Module):
    def __init__(self, ch, rate=2):
        super().__init__()
        out_ch = ch // rate**2
        self.ln = ChannelLN(ch)
        self.proj = nn.Conv2d(ch, out_ch, 1)
        self.rate = rate

    def forward(self, x):
        return self.proj(self.ln(ideal_resample(x, float(self.rate))))


class ConvUNet(nn.Module):
    def __init__(self, in_ch=3, hidden=32, scales=5, blocks=1):
        super().__init__()
        self.inc = nn.Conv2d(in_ch, hidden, 3, padding=1)
        self.outc = nn.Conv2d(hidden, in_ch, 3, padding=1)
        self.scales = scales
        downs, ups, encs, decs = [], [], [], []
        ch = hidden
        for _ in range(scales - 1):
            encs.append(nn.Sequential(*[ConvBlock(ch) for _ in range(blocks)]))
            downs.append(SpectralDown(ch))
            ch *= 4
        self.mid = nn.Sequential(*[ConvBlock(ch) for _ in range(blocks)])
        for _ in range(scales - 1):
            ups.append(SpectralUp(ch))
            ch //= 4
            decs.append(nn.Sequential(*[ConvBlock(ch) for _ in range(blocks)]))
        self.encs, self.downs = nn.ModuleList(encs), nn.ModuleList(downs)
        self.ups, self.decs = nn.ModuleList(ups), nn.ModuleList(decs)

    def forward(self, y):
        div = 2 ** (self.scales - 1)
        h, w = y.shape[-2:]
        ph, pw = (div - h % div) % div, (div - w % div) % div
        x0 = y
        if ph or pw:
            y = F.pad(y, (0, pw, 0, ph), mode="reflect")
        x = self.inc(y)
        skips = []
        for enc, down in zip(self.encs, self.downs):
            xb = x
            x = enc(x) + xb  # inner residual
            skips.append(x)
            x = down(x)
        x = self.mid(x)
        for up, dec in zip(self.ups, self.decs):
            x = up(x) + skips.pop()
            x = dec(x)
        x = self.outc(x)
        if ph or pw:
            x = x[..., :h, :w]
        return x + x0  # outer residual


# ---------------------------------------------------------------------------
# scaling transform (padded kind) via torch grid_sample
# ---------------------------------------------------------------------------


def padded_scaling(x, gen):
    """Per-image rate in {0.75, 0.5}, random center; bicubic grid_sample
    with reflection padding, align_corners=True."""
    b, c, h, w = x.shape
    rates = torch.tensor([0.75, 0.5])[
        (2 * torch.rand(b, generator=gen)).long().clamp(max=1)
    ]
    centers = 2 * torch.rand(b, 2, generator=gen) - 1
    av = 2.0 / h * torch.arange(h, dtype=torch.float32) - 1.0
    au = 2.0 / w * torch.arange(w, dtype=torch.float32) - 1.0
    grids = []
    for i in range(b):
        cx, cy = centers[i, 0], centers[i, 1]
        gv = (av - cy) / rates[i] + cy  # rows
        gu = (au - cx) / rates[i] + cx  # cols
        gy, gx = torch.meshgrid(gv, gu, indexing="ij")
        grids.append(torch.stack([gx, gy], dim=-1))
    grid = torch.stack(grids)
    return F.grid_sample(x, grid, mode="bicubic", padding_mode="reflection",
                         align_corners=True)


# ---------------------------------------------------------------------------
# the proposed loss
# ---------------------------------------------------------------------------


def proposed_loss(model, A, y, sigma, gen, margin=6, tau=1e-2, alpha=1.0):
    b = torch.randn(y.shape, generator=gen)
    mask = torch.zeros_like(y)
    mask[..., margin:-margin, margin:-margin] = 1.0
    b = b * mask
    pair = model(torch.cat([y, y + tau * b], dim=0))
    x_net, x_tau = pair.chunk(2, dim=0)
    y1, y2 = A(x_net), A(x_tau)
    s2 = sigma * sigma
    div = (b * (y2 - y1) / tau)[..., margin:-margin, margin:-margin].mean()
    mse = ((y1 - y)[..., margin:-margin, margin:-margin] ** 2).mean()
    sure = mse + 2 * s2 * div - s2 / y.shape[0]
    x2 = padded_scaling(x_net, gen).detach()
    x3 = model(A(x2))
    return sure + alpha * ((x3 - x2) ** 2).mean(), float(sure)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="experiments/drift_cache.npz")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--loss_crop", type=int, default=48)
    ap.add_argument("--noise_level", type=float, default=5.0)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--scales", type=int, default=5)
    ap.add_argument("--out", default="experiments/runs/torch_drift")
    args = ap.parse_args()

    data = np.load(args.cache)
    xs = torch.tensor(data["x"])  # (N, 3, H, W) clean (unused by the loss)
    ys = torch.tensor(data["y"])  # frozen measurements
    hs, ws_ = data["heights"], data["widths"]
    n = xs.shape[0]
    sigma = args.noise_level / 255.0

    model = ConvUNet(hidden=args.hidden, scales=args.scales)
    n_par = sum(p.numel() for p in model.parameters())
    print(f"torch twin: {n} images, model {n_par/1e6:.2f}M params", flush=True)

    opt = torch.optim.Adam(model.parameters(), lr=args.lr, betas=(0.9, 0.999))
    half = args.epochs // 2

    def lr_factor(epoch):
        if epoch < half:
            return 1.0
        t = (epoch - half) / max(args.epochs - half, 1)
        return 1.0 - (1.0 - 1e-2) * t

    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_factor)
    gen = torch.Generator().manual_seed(0)
    A = FFTBlur(gaussian_kernel(2.0), (args.loss_crop, args.loss_crop)).A

    os.makedirs(args.out, exist_ok=True)
    f = open(os.path.join(args.out, "training.csv"), "w", newline="", buffering=1)
    wcsv = csv.writer(f)
    wcsv.writerow(["Epoch", "Training Loss", "SURE"])

    steps = max(n // args.batch_size, 1)
    for epoch in range(args.epochs):
        perm = torch.randperm(n, generator=gen)
        tot, tot_sure, t0 = 0.0, 0.0, time.time()
        for s in range(steps):
            idx = perm[s * args.batch_size : (s + 1) * args.batch_size]
            batch = []
            for i in idx.tolist():
                h, w = int(hs[i]), int(ws_[i])
                ci = int(torch.randint(0, max(h - args.crop + 1, 1), (1,), generator=gen))
                cj = int(torch.randint(0, max(w - args.crop + 1, 1), (1,), generator=gen))
                yc = ys[i, :, ci : ci + args.crop, cj : cj + args.crop]
                li = int(torch.randint(0, args.crop - args.loss_crop + 1, (1,), generator=gen))
                lj = int(torch.randint(0, args.crop - args.loss_crop + 1, (1,), generator=gen))
                batch.append(yc[:, li : li + args.loss_crop, lj : lj + args.loss_crop])
            y = torch.stack(batch)
            loss, sure = proposed_loss(model, A, y, sigma, gen)
            opt.zero_grad()
            loss.backward()
            opt.step()
            tot += float(loss)
            tot_sure += sure
        sched.step()
        wcsv.writerow([epoch + 1, tot / steps, tot_sure / steps])
        print(f"[{epoch + 1}/{args.epochs}] loss {tot / steps:.3e} "
              f"sure {tot_sure / steps:.3e} ({time.time() - t0:.1f}s)", flush=True)
        torch.save(model.state_dict(), os.path.join(args.out, "last.pt"))


if __name__ == "__main__":
    main()
