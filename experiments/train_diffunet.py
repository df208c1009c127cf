#!/usr/bin/env python
"""Train a small guided-diffusion UNet (DiffUNet) stand-in locally and save
it in the EXACT torch state_dict layout of the published checkpoint
(``diffusion_ffhq_10m.pt``), unlocking the DiffPIR_DiffUNet baseline
end-to-end (ref src/models/diffpir.py:16-24) without network egress:

    python experiments/train_diffunet.py --out experiments/runs/diffunet.pt
    SEI_DIFFUNET_WEIGHTS=experiments/runs/diffunet.pt python demo/test.py \\
        --model_kind DiffPIR_DiffUNet ...

Recipe: standard DDPM epsilon-prediction (Ho et al.; guided-diffusion
training objective) — t ~ U{0..999} per batch, linear betas 1e-4..0.02,
x_t = sqrt(abar_t) x0 + sqrt(1-abar_t) eps in [-1,1] space, MSE on the eps
channels (the learn_sigma variance channels stay at their zero init; the
denoiser interface only consumes eps, sei_tpu/models/diffunet.py:220).
Architecture is config-inferable from the saved state_dict: the loader
(diffunet_config_from_state_dict) reconstructs it with no hand-set config.
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
    ap.add_argument("--out", default="experiments/runs/diffunet.pt")
    ap.add_argument("--datasets_dir", default="/root/repo/datasets")
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--crop", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-4)
    # must be a multiple of 32: guided-diffusion's normalization is
    # GroupNorm(32, C) at every block (sei_tpu/models/diffunet.py), so any
    # channel count the architecture ever produces has to divide by 32
    ap.add_argument("--model_channels", type=int, default=64)
    ap.add_argument("--channel_mult", type=int, nargs="+", default=[1, 2, 2, 4])
    ap.add_argument("--attention_ds", type=int, nargs="+", default=[8])
    args = ap.parse_args()

    from sei_tpu.data import GroundTruthDataset
    from sei_tpu.models.diffunet import (
        DiffUNet,
        DiffUNetConfig,
        ddpm_alphas_cumprod,
        flax_diffunet_to_torch,
    )
    from sei_tpu.models.torch_io import save_torch_state

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

    cfg = DiffUNetConfig(
        model_channels=args.model_channels,
        channel_mult=tuple(args.channel_mult),
        attention_ds=tuple(args.attention_ds),
        num_res_blocks=1,
        num_head_channels=64,  # the loader's (only) assumption; keep it
    )
    net = DiffUNet(cfg=cfg)
    params = net.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3, args.crop, args.crop)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    n_params = sum(int(np.prod(np.shape(l)))
                   for l in jax.tree_util.tree_leaves(params))
    print(f"DiffUNet stand-in: {n_params / 1e6:.2f}M params, cfg={cfg}",
          flush=True)
    tx = optax.adam(args.lr)
    opt = tx.init(params)
    cs = args.crop
    abar = jnp.asarray(ddpm_alphas_cumprod(1000), jnp.float32)

    @jax.jit
    def step(params, opt, key, data, hs, ws):
        # data as an argument, not a closure capture (constant-baked HLO
        # blows up the remote-compile payload; see train_drunet.py)
        ks = jax.random.split(key, 5)
        idx = jax.random.randint(ks[0], (args.batch,), 0, data.shape[0])
        xs = data[idx].astype(jnp.float32)

        def crop(one, h, w, k):
            ki, kj = jax.random.split(k)
            i = jax.random.randint(ki, (), 0, jnp.maximum(h - cs + 1, 1))
            j = jax.random.randint(kj, (), 0, jnp.maximum(w - cs + 1, 1))
            return jax.lax.dynamic_slice(one, (0, i, j), (3, cs, cs))

        x0 = jax.vmap(crop)(xs, hs[idx], ws[idx],
                            jax.random.split(ks[1], args.batch))
        x0 = 2.0 * x0 - 1.0  # diffusion range
        t = jax.random.randint(ks[2], (args.batch,), 0, 1000)
        eps = jax.random.normal(ks[3], x0.shape)
        a = abar[t][:, None, None, None]
        xt = jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * eps

        def loss_fn(p):
            out = net.apply({"params": p}, xt, t)
            return jnp.mean((out[:, :3] - eps) ** 2)

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
    sd = flax_diffunet_to_torch(jax.device_get(params))
    save_torch_state(args.out, sd)
    print("saved:", args.out, flush=True)


if __name__ == "__main__":
    main()
