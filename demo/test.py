#!/usr/bin/env python
"""Evaluation CLI - same flag surface as the reference's demo/test.py.

Computes Y-channel PSNR/SSIM (+LPIPS when weights are available) on the val
split with deterministic per-image measurements, 8-bit quantize+clamp before
metrics; supports --noise2inverse / --r2r eval wrappers, --save_images,
--save_psf, --indices.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sei_tpu.config import DefaultArgParser, add_test_args
from sei_tpu.data import FolderDataset, GroundTruthDataset, write_image
from sei_tpu.metrics import compute_metrics, quantize_and_clamp, register
from sei_tpu.models import get_model
from sei_tpu.noise2inverse import noise2inverse_model
from sei_tpu.physics import get_physics
from sei_tpu.train.checkpoint import get_weights


def main():
    parser = DefaultArgParser()
    add_test_args(parser)
    args = parser.parse_args()

    is_dir = os.path.isdir(args.dataset)
    physics = None
    if not is_dir:
        physics = get_physics(
            task=args.task,
            noise_level=args.noise_level,
            kernel=args.kernel,
            sr_factor=args.sr_factor,
            physics_v2=args.physics_v2,
            physics_true_adjoint=args.physics_true_adjoint,
            antialias=args.physics_antialias,
        )

    if args.lpips_weights:
        from sei_tpu.metrics import set_lpips_weights

        set_lpips_weights(args.lpips_weights)

    model = get_model(
        kind=args.model_kind,
        architecture=args.ProposedModel__architecture,
        task=args.task,
        sr_factor=args.sr_factor,
        physics=physics,
        noise_level=args.noise_level,
        homogeneous_swinir=args.homogeneous_swinir,
        swinir_overrides={
            "embed_dim": args.SwinIR__embed_dim,
            "depths": args.SwinIR__depths,
            "num_heads": args.SwinIR__num_heads,
            "window_size": args.SwinIR__window_size,
            "drop_path_rate": args.SwinIR__drop_path_rate,
        },
        dip_iterations=args.dip_iterations,
        tv_lambd=args.tv_lambd,
        tv_max_iter=args.tv_max_iter,
        kernel_name=args.kernel,
    )
    if args.weights is not None:
        model.load_weights(get_weights(args.weights))

    # dataset ----------------------------------------------------------------
    basename_table = {}
    if is_dir:
        src = FolderDataset(args.dataset)
        n = len(src)

        def get_pair(i):
            basename_table[i] = src.basename(i)
            return None, src.load(i)

    else:
        gt = GroundTruthDataset(
            dataset_name=args.dataset,
            datasets_dir=args.GroundTruthDataset__datasets_dir,
            split=args.GroundTruthDataset__split,
            download=args.GroundTruthDataset__download,
            size=args.GroundTruthDataset__size,
            memoize_gt=args.memoize_gt,
            single_image_blueprint={
                "image_path": args.SingleImageDataset__image_path,
                "duplicates_count": args.SingleImageDataset__duplicates_count,
            },
        )
        n = len(gt)
        base_key = jax.random.PRNGKey(0)

        def get_pair(i):
            x = np.asarray(gt[i])
            if args.SyntheticDataset__deterministic_measurements:
                seed = gt.unique_id(i) if args.SyntheticDataset__unique_seeds else 0
            else:
                seed = None
            rate = physics.rate if physics.task == "sr" else 1
            # degrade the FULL image (ref SyntheticDataset), THEN crop x so
            # x.shape == y.shape * rate (ref TestDataset crops after
            # synthesis, src/datasets/__init__.py:119-127).
            xj = jnp.asarray(x)[None]
            key = base_key if seed is not None else jax.random.fold_in(
                base_key, np.random.randint(2**31)
            )
            y = physics.randomly_degrade(xj, key, seed=seed)[0]
            if x.shape[-2:] != tuple(np.array(y.shape[-2:]) * rate):
                x = x[..., : y.shape[-2] * rate, : y.shape[-1] * rate]
            if args.noise2inverse and physics.task == "deblurring":
                # even-size fix (ref src/datasets/__init__.py:112-117)
                y = y[:, : 2 * (y.shape[1] // 2), : 2 * (y.shape[2] // 2)]
                x = x[:, : 2 * (x.shape[-2] // 2) * rate, : 2 * (x.shape[-1] // 2) * rate]
            return x, np.asarray(y)

    if args.save_psf:
        assert args.out_dir is not None
        assert physics.task == "deblurring"
        k = np.asarray(physics.kernel)
        k = k / k.max()
        write_image(os.path.join(args.out_dir, "psf.png"), k[None])

    # model application ------------------------------------------------------
    # Shape bucketing: val images vary in width (shorter side 256), and every
    # new shape is a fresh XLA compile.  For trainable models we reflect-pad
    # the measurement up to a multiple of 64 (one compile per bucket, ~6 for
    # Div2K val) and crop the output back; physics-based baselines are cheap
    # to compile and run at native shape.
    from sei_tpu.models import Model as _TrainableModel

    bucket = (
        args.eval_pad_bucket
        if (isinstance(model, _TrainableModel) and args.eval_pad_bucket > 0)
        else None
    )

    f_scale = args.sr_factor if args.task == "sr" else 1

    # jit the forward once; shapes are bucketed so the compile count is small
    if isinstance(model, _TrainableModel):
        _jitted = jax.jit(lambda p, y: model.apply_fn(p, y))
        model_fwd = lambda y: _jitted(model.params, y)
    else:
        model_fwd = jax.jit(model.fn)

    def apply_model(yj):
        if bucket is None:
            return model_fwd(yj)
        h, w = yj.shape[-2], yj.shape[-1]
        if h > args.eval_tile_height:
            # Full-resolution eval: strip tiling with halo keeps attention
            # activation memory bounded (sei_tpu/parallel/tiling.py).
            from sei_tpu.parallel.tiling import tiled_apply

            n_tiles = max(2, -(-h // args.eval_tile_height))
            strip = -(-h // n_tiles)
            halo = min(64, (h - strip) // 2)
            return tiled_apply(
                model_fwd, yj, n_tiles=n_tiles, halo=halo,
                out_scale=f_scale,
            )
        ph = (-h) % bucket
        pw = (-w) % bucket
        if ph or pw:
            yj = jnp.pad(
                yj, ((0, 0), (0, 0), (0, ph), (0, pw)), mode="reflect"
            )
        out = model_fwd(yj)
        return out[..., : h * f_scale, : w * f_scale]

    apply = apply_model
    if args.noise2inverse:
        apply = noise2inverse_model(
            apply_model,
            task=physics.task,
            kernel=physics.kernel,
            degradation_inverse_fn=physics.A_dagger,
        )

    indices = (
        range(n) if args.indices is None else [int(i) for i in args.indices.split(",")]
    )

    psnr_list, ssim_list, lpips_list = [], [], []
    key = jax.random.PRNGKey(1)
    for i in indices:
        x, y = get_pair(i)
        yj = jnp.asarray(y)[None]

        if args.r2r:
            N = args.r2r_itercount
            acc = None
            for t in range(N):
                key, sub = jax.random.split(key)
                pert = physics.sigma * jax.random.normal(sub, yj.shape, yj.dtype)
                out = apply(yj + 0.5 * pert)
                acc = out if acc is None else acc + out
            x_hat = acc / N
        else:
            x_hat = apply(yj)

        x_hat = quantize_and_clamp(x_hat)[0]
        if x is not None:
            xq = quantize_and_clamp(jnp.asarray(x))
            p, s, l = compute_metrics(xq, x_hat)
            psnr_list.append(p)
            ssim_list.append(s)
            lpips_list.append(l)
            if args.print_all_metrics:
                print(f"METRICS_{i}: PSNR: {p:.2f}, SSIM: {s:.4f}, LIPS: {l:.4f}")

        if args.save_images:
            assert args.out_dir is not None
            name = basename_table.get(i, f"{i}.png")
            if x is not None:
                write_image(
                    os.path.join(args.out_dir, "ground_truth", name), np.asarray(xq)
                )
            write_image(
                os.path.join(args.out_dir, "predictors", name),
                np.asarray(quantize_and_clamp(yj)[0]),
            )
            write_image(os.path.join(args.out_dir, "estimates", name), np.asarray(x_hat))

    N = len(psnr_list)
    if N != 0:
        print(f"N: {N}")
        print(f"PSNR: {np.mean(psnr_list):.2f}")
        print(f"PSNR std: {np.std(psnr_list):.2f}")
        print(f"SSIM: {np.mean(ssim_list):.4f}")
        print(f"SSIM std: {np.std(ssim_list):.4f}")
        if not np.all(np.isnan(lpips_list)):
            print(f"LPIPS: {np.nanmean(lpips_list):.4f}")
            print(f"LPIPS std: {np.nanstd(lpips_list):.4f}")
        else:
            print("LPIPS: n/a (no local LPIPS weights; pass --lpips_weights)")


if __name__ == "__main__":
    main()
