"""Model registry and weight I/O.

Parity with ref src/models/__init__.py:91-234: ``get_model(kind, ...)``
builds one of
  Proposed (SwinIR | Convolutional), DeepImagePrior, PlugAndPlay, BM3D,
  DiffPIR_DRUNet, DiffPIR_DiffUNet, DPS, TV, Identity, InverseFilter,
  Upsample
wrapped in a :class:`Model` with ``get_weights`` / ``load_weights`` that
interoperate with the reference's torch checkpoints.

TPU design: trainable models are flax modules; ``Model`` carries the module,
a params pytree, and pure ``apply`` functions (the training step never touches
this wrapper - it closes over ``Model.apply_fn``).  DataParallel has no
analog here: batch parallelism is mesh sharding in the trainer
(sei_tpu/parallel), not a model wrapper.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .baselines import (
    dip_model,
    identity_model,
    inverse_filter_model,
    tv_model,
    upsample_model,
)
from .convolutional import ConvolutionalModel
from .swinir import SwinIR
from .torch_io import (
    flax_swinir_to_torch,
    load_torch_file,
    save_torch_state,
    torch_swinir_to_flax,
)

KINDS = (
    "Proposed",
    "DeepImagePrior",
    "PlugAndPlay",
    "BM3D",
    "DiffPIR_DRUNet",
    "DiffPIR_DiffUNet",
    "DPS",
    "TV",
    "Identity",
    "InverseFilter",
    "Upsample",
)

# README spellings (ref README.md:88 vs code names; SURVEY.md section 2.5)
KIND_ALIASES = {
    "swinir": "Proposed",
    "dip": "DeepImagePrior",
    "pnp": "PlugAndPlay",
    "bm3d": "BM3D",
    "up": "Upsample",
    "id": "Identity",
}


def swinir_config(
    *,
    task: str,
    sr_factor: Optional[int],
    homogeneous: bool = False,
    overrides: Optional[dict] = None,
) -> SwinIR:
    """The reference's trained SwinIR config (ref src/models/__init__.py:51-74).

    ``overrides`` (embed_dim / depths / num_heads / window_size / ...) is an
    extension over the reference — its CLI pins the published architecture,
    which makes small-scale smoke runs impossible; ``--SwinIR__*`` flags
    feed through here.
    """
    if task == "sr" and sr_factor and sr_factor > 1 and not homogeneous:
        upscale, upsampler = sr_factor, "pixelshuffle"
    else:
        upscale, upsampler = 1, None
    cfg = dict(
        upscale=upscale,
        upsampler=upsampler,
        img_size=48,
        in_chans=3,
        embed_dim=180,
        depths=(6,) * 6,
        num_heads=(6,) * 6,
        window_size=8,
        mlp_ratio=2.0,
        qkv_bias=True,
        drop_path_rate=0.1,
        patch_norm=True,
        img_range=1.0,
        resi_connection="1conv",
    )
    for k, v in (overrides or {}).items():
        if v is None:
            continue
        assert k in cfg, f"unknown SwinIR override {k}"
        cfg[k] = tuple(v) if isinstance(v, list) else v
    return SwinIR(**cfg)


@dataclasses.dataclass
class Model:
    """A trainable model: flax module + params + pure apply fns."""

    module: Any
    params: Any
    kind: str
    architecture: Optional[str] = None

    def apply_fn(self, params, y, *, train: bool = False, rng: Optional[jax.Array] = None):
        kwargs = {}
        if isinstance(self.module, SwinIR):
            kwargs["deterministic"] = not train
        rngs = {"dropout": rng} if (train and rng is not None) else None
        return self.module.apply({"params": params}, y, rngs=rngs, **kwargs)

    def __call__(self, y, *, train: bool = False, rng=None):
        # Convenience path (tests, baselines; the train step and the eval
        # CLI build their own jits over apply_fn).  Eager flax apply
        # dispatches hundreds of tiny op-compiles on CPU, so jit lazily,
        # cached per (train, has-rng) signature; shapes recompile as usual.
        key = (bool(train), rng is not None)
        cache = self.__dict__.setdefault("_jit_cache", {})
        fn = cache.get(key)
        if fn is None:
            if key[1]:
                fn = jax.jit(lambda p, yy, r: self.apply_fn(p, yy, train=key[0], rng=r))
            else:
                g = jax.jit(lambda p, yy: self.apply_fn(p, yy, train=key[0]))
                fn = lambda p, yy, r: g(p, yy)
            cache[key] = fn
        return fn(self.params, y, rng)

    # -- weight I/O (torch-interoperable) -----------------------------------
    def get_weights(self):
        return self.params

    def load_weights(self, weights):
        """Accept a flax params tree or a torch state_dict (np arrays)."""
        if isinstance(weights, dict) and "params" in weights and (
            "epoch" in weights or "opt_state" in weights or "optimizer" in weights
        ):
            # full training checkpoint: unwrap the params entry, exactly as
            # the reference unwraps state["params"] (ref src/training.py:44)
            weights = weights["params"]
        if isinstance(weights, dict) and any("." in k for k in weights):
            if isinstance(self.module, SwinIR):
                weights = torch_swinir_to_flax(weights)
            else:
                raise ValueError(
                    f"no torch converter for {type(self.module).__name__}"
                )
        weights = jax.tree_util.tree_map(jnp.asarray, weights)
        # shape check against current params
        jax.tree_util.tree_map(
            lambda a, b: (_ for _ in ()).throw(
                ValueError(f"shape mismatch {a.shape} vs {b.shape}")
            )
            if a.shape != b.shape
            else None,
            self.params,
            weights,
        )
        self.params = weights

    def save_reference_format(self, path: str):
        """Save weights loadable by the reference repo (torch state_dict)."""
        if isinstance(self.module, SwinIR):
            save_torch_state(path, flax_swinir_to_torch(self.params))
        else:
            raise ValueError("reference-format save only supported for SwinIR")


@dataclasses.dataclass
class FunctionalModel:
    """An eval-only baseline: a pure function of the measurement."""

    fn: Callable
    kind: str
    params: Any = None

    def apply_fn(self, params, y, **_):
        return self.fn(y)

    def __call__(self, y, **_):
        return self.fn(y)

    def get_weights(self):
        return {}

    def load_weights(self, weights):
        pass


def get_model(
    *,
    kind: str = "Proposed",
    architecture: str = "Transformer",
    task: str,
    sr_factor: Optional[int] = None,
    physics=None,
    noise_level: float = 5.0,
    rng: Optional[jax.Array] = None,
    init_input_size: int = 48,
    dtype=jnp.float32,
    homogeneous_swinir: bool = False,
    swinir_overrides: Optional[dict] = None,
    conv_blueprint: Optional[dict] = None,
    dip_iterations: Optional[int] = None,
    tv_lambd: Optional[float] = None,
    tv_max_iter: int = 300,
    kernel_name: Optional[str] = None,
):
    """Factory mirroring ref get_model (src/models/__init__.py:173-234)."""
    kind = KIND_ALIASES.get(kind, kind)
    assert kind in KINDS, f"Unknown model kind: {kind}"
    sampling_rate = sr_factor if task == "sr" else 1

    if kind == "Proposed":
        if architecture == "Transformer":
            module = swinir_config(
                task=task, sr_factor=sampling_rate,
                homogeneous=homogeneous_swinir, overrides=swinir_overrides,
            )
        elif architecture == "Convolutional":
            bp = conv_blueprint or {}
            module = ConvolutionalModel(
                in_channels=3,
                upsampling_rate=sampling_rate or 1,
                residual=bp.get("residual", True),
                inner_residual=bp.get("inner_residual", True),
                num_conv_blocks=bp.get("num_conv_blocks", 1),
                hidden_channels=bp.get("hidden_channels", 32),
                inout_convs=bp.get("inout_convs", True),
                scales=bp.get("scales", 5),
            )
        else:
            raise ValueError(f"Unknown model kind: {architecture}")
        rng = jax.random.PRNGKey(0) if rng is None else rng
        dummy = jnp.zeros((1, 3, init_input_size, init_input_size), dtype)
        # jit: eager flax init dispatches each initializer as its own tiny
        # CPU compile; one jitted graph is ~10x faster and cache-persistable.
        params = jax.jit(module.init)(rng, dummy)["params"]
        return Model(module=module, params=params, kind=kind, architecture=architecture)

    if kind == "Identity":
        return FunctionalModel(identity_model(physics), kind)
    if kind == "InverseFilter":
        return FunctionalModel(inverse_filter_model(physics), kind)
    if kind == "Upsample":
        return FunctionalModel(upsample_model(physics, sr_factor), kind)
    if kind == "TV":
        return FunctionalModel(
            tv_model(physics, lambd=tv_lambd, max_iter=tv_max_iter), kind
        )
    if kind == "DeepImagePrior":
        if dip_iterations is None:
            # ref src/models/__init__.py:194-204
            if task == "deblurring" and kernel_name and "Gaussian" in kernel_name:
                dip_iterations = 4000
            else:
                dip_iterations = 1000
        return FunctionalModel(
            dip_model(physics, iterations=dip_iterations, sr_factor=sr_factor), kind
        )
    if kind in ("PlugAndPlay", "DiffPIR_DRUNet", "DiffPIR_DiffUNet", "DPS"):
        from .pnp import get_denoiser_model

        return get_denoiser_model(
            kind, physics=physics, noise_level=noise_level, task=task, sr_factor=sr_factor
        )
    if kind == "BM3D":
        from .bm3d import bm3d_model

        return FunctionalModel(
            bm3d_model(physics, sigma_psd=noise_level / 255.0), kind
        )
    raise ValueError(f"Unknown model kind: {kind}")
