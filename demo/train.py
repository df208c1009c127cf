#!/usr/bin/env python
"""Training CLI - same flag surface as the reference's demo/train.py.

Example (the paper's main config):
    python demo/train.py --task deblurring --kernel Gaussian_R2 \
        --method proposed --dataset div2k --out_dir runs/deblur_r2

The whole train step (batch sampling from the HBM-resident dataset, crops,
SURE+EI loss, backward, update) runs as one jitted graph sharded over the
device mesh; see sei_tpu/train/trainer.py.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sei_tpu.config import (
    DefaultArgParser,
    add_train_args,
    default_checkpoint_interval,
    default_epochs,
    default_lr,
    default_optimizer,
)
from sei_tpu.data import DeviceDataCache, GroundTruthDataset, build_device_cache
from sei_tpu.losses import LossConfig, compute_sure_margin, get_loss, normalize_method
from sei_tpu.models import get_model
from sei_tpu.physics import get_physics
from sei_tpu.train.checkpoint import get_weights
from sei_tpu.train.trainer import Trainer


def build_finetuning_cache(dataset_dir: str, crop_size: int, rng: np.random.Generator):
    """Directory-of-predictors fine-tuning dataset (ref demo/train.py:95-114):
    y = random crop of each PNG, x = zeros (unused by the proposed loss)."""
    from sei_tpu.data import FolderDataset

    src = FolderDataset(dataset_dir)
    ys = []
    for i in range(len(src)):
        im = src.load(i)
        c, h, w = im.shape
        if h < crop_size or w < crop_size:
            pad_h, pad_w = max(0, crop_size - h), max(0, crop_size - w)
            im = np.pad(im, ((0, 0), (0, pad_h), (0, pad_w)))
            c, h, w = im.shape
        top = int(rng.integers(0, h - crop_size + 1))
        left = int(rng.integers(0, w - crop_size + 1))
        ys.append(im[:, top : top + crop_size, left : left + crop_size])
    y = jnp.asarray(np.stack(ys))
    x = jnp.zeros_like(y)
    n = y.shape[0]
    size = jnp.full((n,), crop_size, dtype=jnp.int32)
    return DeviceDataCache(
        x=x, y=y, heights=size, widths=size, ids=jnp.arange(n), rate=1
    )


def main():
    parser = DefaultArgParser()
    add_train_args(parser)
    args = parser.parse_args()

    np.random.seed(args.seed)

    physics = get_physics(
        task=args.task,
        noise_level=args.noise_level,
        kernel=args.kernel,
        sr_factor=args.sr_factor,
        physics_v2=args.physics_v2,
        physics_true_adjoint=args.physics_true_adjoint,
        antialias=args.physics_antialias,
    )

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
        conv_blueprint={
            "residual": args.ConvolutionalModel__residual,
            "inner_residual": args.ConvolutionalModel__inner_residual,
            "num_conv_blocks": args.ConvolutionalModel__num_conv_blocks,
            "inout_convs": args.ConvolutionalModel__inout_convs,
            "hidden_channels": args.ConvolutionalModel__hidden_channels,
            "scales": args.ConvolutionalModel__scales,
        },
        rng=jax.random.PRNGKey(args.seed),
    )

    if args.ProposedModel__architecture == "Transformer":
        import dataclasses as _dc
        import jax.numpy as _jnp

        if args.bf16:
            model.module = _dc.replace(model.module, dtype=_jnp.bfloat16)
        # memory/time knob: rematerialize the first K RSTBs (one freed RSTB
        # ~ 1.9GB of f32 activations at ~+6% step time); the f32 proposed
        # step at batch 8 needs K>=1 on a 16GB-HBM chip
        rl = int(os.environ.get("SEI_REMAT_LAYERS", "0") or 0)
        if rl:
            model.module = _dc.replace(model.module, remat_layers=rl)

    if args.weights is not None:
        model.load_weights(get_weights(args.weights))

    method, transforms = normalize_method(
        args.method, args.ProposedLoss__transforms
    )

    loss_kwargs = dict(
        method=method,
        physics=physics,
        noise_level=args.noise_level,
        partial_sure=args.partial_sure,
        partial_sure_sr=args.partial_sure_sr,
        sure_margin=args.sure_margin,
        sure_cropped_div=args.sure_cropped_div,
        sure_averaged_cst=args.sure_averaged_cst,
        stop_gradient=args.ProposedLoss__stop_gradient,
        sure_alternative=args.ProposedLoss__sure_alternative,
        alpha_tradeoff=args.ProposedLoss__alpha_tradeoff,
        transforms=transforms,
        scaling_kind=args.ScalingTransform__kind,
        scaling_antialias=args.ScalingTransform__antialias,
        crop_training_pairs=args.Loss__crop_training_pairs,
        crop_size=args.Loss__crop_size,
        supervised_l1=args.supervised_l1,
        sure_rate_hotfix=args.sure_rate_hotfix,
    )
    normal_rate_losses = None
    if (
        transforms == "Scaling_Transforms"
        and args.ScalingTransform__kind == "normal"
        and method == "proposed"
    ):
        normal_rate_losses = [
            get_loss(**loss_kwargs, fixed_normal_rate=r) for r in (0.75, 0.5)
        ]
        loss_fn = normal_rate_losses[0]
    else:
        loss_fn = get_loss(**loss_kwargs)

    # ---- dataset -> device cache -------------------------------------------
    rng = np.random.default_rng(args.seed)
    if os.path.isdir(args.dataset):
        assert args.fine_tuning, (
            "Datasets of predictors only are only supported for fine-tuning"
        )
        assert method == "proposed", (
            "Fine-tuning is only supported for the proposed method"
        )
        cache = build_finetuning_cache(
            args.dataset, args.PrepareTrainingPairs__crop_size, rng
        )
        dataset_crop = args.PrepareTrainingPairs__crop_size
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
        cache = build_device_cache(
            gt,
            physics,
            base_key=jax.random.PRNGKey(args.seed),
            deterministic=args.SyntheticDataset__deterministic_measurements,
            unique_seeds=args.SyntheticDataset__unique_seeds,
            upsample_y_to_x=args.homogeneous_swinir and args.task == "sr",
        )
        # SR uses the direct 48-crop path; deblurring crops 256 then the loss
        # crops 48 (ref demo/train.py:116-119 + datasets/__init__.py:78-90).
        dataset_crop = (
            args.Loss__crop_size if args.task == "sr"
            else args.PrepareTrainingPairs__crop_size
        )
        if args.homogeneous_swinir:
            dataset_crop = 48

    epochs = args.epochs if args.epochs is not None else default_epochs(args.dataset)
    lr = args.lr if args.lr is not None else default_lr(args.task, args.fine_tuning)
    optimizer = args.optimizer or default_optimizer(args.fine_tuning)
    ckpt_interval = (
        args.checkpoint_interval
        if args.checkpoint_interval is not None
        else default_checkpoint_interval(args.dataset)
    )
    print(f"\nSelected learning rate: {lr:e}\n")
    print(f"\nSelected optimizer: {optimizer}\n")

    trainable_mask = None
    if args.fine_tuning_params:
        assert args.fine_tuning, (
            "Fine-tuning parameters are only supported for fine-tuning"
        )
        # conv_last only (ref demo/train.py:176-184)
        trainable_mask = jax.tree_util.tree_map_with_path(
            lambda path, _: any(
                getattr(p, "key", None) == "conv_last" for p in path
            ),
            model.params,
        )

    # --data_parallel_devices: the reference's DataParallel device list;
    # here it selects how many mesh devices to shard the batch over.
    mesh = None
    if args.data_parallel_devices is not None:
        from sei_tpu.parallel import make_mesh

        n_dev = len(args.data_parallel_devices.split(","))
        mesh = make_mesh(jax.devices()[:n_dev])

    # --eval_interval: in-training validation on the val split of the same
    # dataset (mechanized operating-point selection; Trainer docstring).
    eval_hook = None
    if args.eval_interval and not os.path.isdir(args.dataset):
        from sei_tpu.train.validate import ValidationHook

        val_split = "all" if args.dataset.startswith("gt_folder:") else "val"
        try:
            val_gt = GroundTruthDataset(
                dataset_name=args.dataset,
                datasets_dir=args.GroundTruthDataset__datasets_dir,
                split=val_split,
                size=args.GroundTruthDataset__size,
                memoize_gt=args.memoize_gt,
                single_image_blueprint={
                    "image_path": args.SingleImageDataset__image_path,
                    "duplicates_count": 1,
                },
            )
            eval_hook = ValidationHook(
                val_gt, physics, model.apply_fn, max_images=args.eval_count
            )
        except (ValueError, AssertionError) as e:
            print(f"eval_interval disabled (no val split): {e}")

    trainer = Trainer(
        model=model,
        loss_fn=loss_fn,
        physics=physics,
        cache=cache,
        mesh=mesh,
        eval_interval=args.eval_interval if eval_hook is not None else 0,
        eval_hook=eval_hook,
        batch_size=args.batch_size,
        epochs=epochs,
        lr=lr,
        optimizer=optimizer,
        beta2=args.optimizer_beta2,
        lr_scheduler_kind=args.lr_scheduler_kind,
        crop_size=dataset_crop,
        css=(method == "css"),
        fresh_measurements=not args.SyntheticDataset__deterministic_measurements,
        out_dir=args.out_dir,
        checkpoint_interval=ckpt_interval,
        trainable_mask=trainable_mask,
        weights_distance_lambda=1.0 if args.weights_distance_loss else None,
        base_key=jax.random.PRNGKey(args.seed),
        normal_rate_losses=normal_rate_losses,
        scan_steps=args.scan_steps,
    )

    if args.weights_distance_loss:
        assert args.fine_tuning, (
            "Weights distance loss is only supported for fine-tuning"
        )

    if args.RESUME is not None:
        assert args.lr is not None, "RESUME requires an explicit --lr"
        # reference parity: RESUME pins the lr and disables the scheduler
        # (ref demo/train.py:213-230); --RESUME_keep_schedule instead keeps
        # the step-indexed schedule (exact continuation after a crash)
        trainer.disable_scheduler = not args.RESUME_keep_schedule
        trainer.__post_init__()
        trainer.load_checkpoint(args.RESUME)
        print("Loading checkpoint from epoch", trainer.start_epoch)

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    state, stats = trainer.train()

    if args.profile_dir:
        jax.profiler.stop_trace()

    print(
        f"\nTrained {stats['steps']} steps in {stats['wall_time_s']:.1f}s "
        f"({stats['images_per_sec']:.1f} images/sec)\n"
    )

    if args.out_dir:
        from sei_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.out_dir)
        mgr._ckpt.save(
            os.path.join(os.path.abspath(args.out_dir), "weights"),
            jax.device_get(jax.tree_util.tree_map(np.asarray, model.params)),
            force=True,
        )
        mgr.wait()
        if args.ProposedModel__architecture == "Transformer" and args.model_kind in (
            "Proposed",
            "swinir",
        ):
            model.save_reference_format(os.path.join(args.out_dir, "weights.pt"))


if __name__ == "__main__":
    main()
