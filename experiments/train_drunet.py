#!/usr/bin/env python
"""Train a DRUNet denoiser on the dead-leaves dataset (no-egress stand-in
for the published drunet_color weights) and save it in the native .npz
format, unlocking the PnP / DiffPIR_DRUNet / DPS baselines end-to-end:

    python experiments/train_drunet.py --out experiments/runs/drunet.npz
    SEI_DRUNET_WEIGHTS=experiments/runs/drunet.npz python demo/test.py \\
        --model_kind PlugAndPlay ...

Recipe: blind Gaussian denoising, sigma ~ U(0, 55/255) with the noise map
channel (the DRUNet training setup of Zhang et al., DPIR), random 64px
crops, MSE, Adam.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="experiments/runs/drunet.npz")
    ap.add_argument("--datasets_dir", default="/root/repo/datasets")
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--crop", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--channels", type=int, nargs="+",
                    default=[64, 128, 256, 512])
    ap.add_argument("--nb", type=int, default=4)
    # Wide-sigma mode for the diffusion samplers: DPS walks sigma_t/2 up to
    # ~75 in [0,1] space, far past DRUNet's published [0, 55/255] training
    # range (the reference inherits the same ceiling from deepinv's
    # pretrained DRUNet, ref src/models/dps.py:13).  Log-uniform sampling
    # covers the decades evenly.
    ap.add_argument("--sigma_max", type=float, default=55.0 / 255.0)
    ap.add_argument("--sigma_dist", choices=["uniform", "log"],
                    default="uniform")
    args = ap.parse_args()

    from sei_tpu.data import GroundTruthDataset
    from sei_tpu.models.drunet import DRUNet, save_drunet_native

    gt = GroundTruthDataset(dataset_name="div2k",
                            datasets_dir=args.datasets_dir, split="train")
    imgs = [np.asarray(im) for im in gt.load_all()]
    hmax = max(im.shape[-2] for im in imgs)
    wmax = max(im.shape[-1] for im in imgs)
    xpad = np.zeros((len(imgs), 3, hmax, wmax), np.float16)
    hs = np.zeros(len(imgs), np.int32)
    ws = np.zeros(len(imgs), np.int32)
    for i, im in enumerate(imgs):
        xpad[i, :, : im.shape[-2], : im.shape[-1]] = im
        hs[i], ws[i] = im.shape[-2], im.shape[-1]
    data = jnp.asarray(xpad)
    hs, ws = jnp.asarray(hs), jnp.asarray(ws)

    net = DRUNet(channels=tuple(args.channels), nb=args.nb)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 3, args.crop, args.crop)), 0.1)["params"]
    tx = optax.adam(args.lr)
    opt = tx.init(params)
    cs = args.crop

    @jax.jit
    def step(params, opt, key, data, hs, ws):
        # data passed as an argument: closure-captured arrays are baked into
        # the HLO as constants (an 840MB compile payload -> HTTP 413 on the
        # remote compiler)
        ks = jax.random.split(key, 5)
        idx = jax.random.randint(ks[0], (args.batch,), 0, data.shape[0])
        xs = data[idx].astype(jnp.float32)

        def crop(one, h, w, k):
            ki, kj = jax.random.split(k)
            i = jax.random.randint(ki, (), 0, jnp.maximum(h - cs + 1, 1))
            j = jax.random.randint(kj, (), 0, jnp.maximum(w - cs + 1, 1))
            return jax.lax.dynamic_slice(one, (0, i, j), (3, cs, cs))

        x = jax.vmap(crop)(xs, hs[idx], ws[idx],
                           jax.random.split(ks[1], args.batch))
        if args.sigma_dist == "log":
            lo, hi = np.log(1e-3), np.log(args.sigma_max)
            sigma = jnp.exp(jax.random.uniform(ks[2], (), minval=lo, maxval=hi))
        else:
            sigma = jax.random.uniform(ks[2], (), minval=0.0,
                                       maxval=args.sigma_max)
        y = x + sigma * jax.random.normal(ks[3], x.shape)

        def loss_fn(p):
            out = net.apply({"params": p}, y, sigma)
            mse = jnp.mean((out - x) ** 2)
            if args.sigma_dist == "log":
                # residual variance scales ~sigma^2; without this weight the
                # top decade of a wide log range swamps the gradient signal
                mse = mse / (sigma**2 + 1e-4)
            return mse

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        return params, opt, loss

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        params, opt, loss = step(params, opt, k, data, hs, ws)
        if (i + 1) % 500 == 0:
            print(f"step {i + 1}/{args.steps} loss {float(loss):.3e} "
                  f"({(i + 1) / (time.time() - t0):.1f} it/s)", flush=True)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_drunet_native(args.out, jax.device_get(params),
                       channels=args.channels, nb=args.nb)
    print("saved:", args.out, flush=True)


if __name__ == "__main__":
    main()
