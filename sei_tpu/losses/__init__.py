"""Training losses (method dispatch) as pure keyed functions.

Parity map (ref src/losses/__init__.py:145-266):
  supervised / css / noise2inverse -> plain MSE on the (x, y) pair the
      dataset synthesizes (the methods differ only in data synthesis);
  sure       -> MC-SURE in measurement space;
  proposed   -> SURE + EI over a transform group (default: scaling), with
      optional stop-gradient and the R2R alternative.

Every loss is ``loss(key, x, y, model) -> scalar`` where ``model`` is a
closed-over apply function; the pre-loss aligned 48-crop of the reference
(ref :187-207) is applied by :class:`LossConfig.apply`.

README alias note (SURVEY.md section 2.5): the public method names
``sup | ei-shift | ei-rotate`` are accepted and normalized here.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..transforms import crop_pair_batch, get_ei_transform
from .r2r import r2r_ei_loss, r2r_loss  # noqa: F401
from .sure import (  # noqa: F401
    mc_divergence,
    sample_probe,
    sure_gaussian_loss,
    sure_gaussian_loss_from_outputs,
)
from .weights_distance import weights_distance_loss  # noqa: F401

METHOD_ALIASES = {
    "sup": "supervised",
    "ei-shift": ("proposed", "Shifts"),
    "ei-rotate": ("proposed", "Rotations"),
}
METHODS = ("supervised", "css", "noise2inverse", "sure", "proposed")


def normalize_method(method: str, transforms: str) -> tuple[str, str]:
    """Resolve README aliases to (method, ProposedLoss__transforms)."""
    if method in METHOD_ALIASES:
        v = METHOD_ALIASES[method]
        if isinstance(v, tuple):
            return v
        return v, transforms
    assert method in METHODS, f"Unknown method: {method}"
    return method, transforms


def _mse(a, b):
    d = a - b
    return jnp.mean(d * d)


def _l1(a, b):
    return jnp.mean(jnp.abs(a - b))


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Everything get_loss derives from flags (ref src/losses/__init__.py:210-266)."""

    method: str = "proposed"
    noise_level: float = 5.0
    sure_cropped_div: bool = True
    sure_averaged_cst: bool = False
    sure_margin: int = 0
    stop_gradient: bool = True
    sure_alternative: Optional[str] = None  # None | "r2r"
    alpha_tradeoff: float = 1.0
    transforms: str = "Scaling_Transforms"
    scaling_kind: str = "padded"
    scaling_antialias: bool = False
    crop_training_pairs: bool = True
    crop_size: int = 48
    xy_size_ratio: int = 1
    supervised_l1: bool = False  # explicit flag for the SUPERVISED_L1 env hook
    sure_rate_hotfix: Optional[float] = None  # explicit _TEMPORARY_HOTFIX
    # "normal" scaling kind shrinks the image, so its rate must be static
    # under jit; the trainer compiles one loss variant per rate and picks one
    # per step (matching the reference's one-batch-wide-rate sampling,
    # ref src/transforms.py:126-145).
    fixed_normal_rate: Optional[float] = None

    @property
    def sigma(self) -> float:
        return self.noise_level / 255.0

    def ei_transform(self):
        if (
            self.transforms == "Scaling_Transforms"
            and self.scaling_kind == "normal"
        ):
            assert self.fixed_normal_rate is not None, (
                "normal scaling kind needs a static per-step rate; build one "
                "loss variant per rate (see trainer)"
            )
            from ..ops.scaling import normal_scaling_transform

            rate = self.fixed_normal_rate
            return lambda key, x: normal_scaling_transform(
                x, rate, antialias=self.scaling_antialias
            )
        return get_ei_transform(
            self.transforms, kind=self.scaling_kind, antialias=self.scaling_antialias
        )

    def build(self, A: Callable) -> Callable:
        """Return loss(key, x, y, model) -> scalar for the chosen method."""
        method = self.method
        sigma = self.sigma

        if method in ("supervised", "css", "noise2inverse"):
            metric = _l1 if (method == "supervised" and self.supervised_l1) else _mse

            def fn(key, x, y, model):
                return metric(model(y), x)

        elif method == "sure":

            def fn(key, x, y, model):
                # fused: f(y) and f(y + tau*b) in ONE 2B-sized forward
                tau = 1e-2
                probe_margin = self.sure_margin if self.sure_cropped_div else 0
                b = sample_probe(key, y, probe_margin)
                pair = model(jnp.concatenate([y, y + b * tau], axis=0))
                x_net, x_tau = jnp.split(pair, 2, axis=0)
                return sure_gaussian_loss_from_outputs(
                    y,
                    x_net,
                    x_tau,
                    b,
                    A,
                    sigma=sigma,
                    tau=tau,
                    margin=self.sure_margin,
                    cropped_div=self.sure_cropped_div,
                    averaged_cst=self.sure_averaged_cst,
                )

        elif method == "proposed":
            transform = self.ei_transform()
            t_apply = transform if callable(transform) else transform.__call__

            if self.sure_alternative == "r2r":

                def fn(key, x, y, model):
                    return r2r_ei_loss(
                        key,
                        y,
                        model,
                        A,
                        t_apply,
                        sigma=sigma,
                        stop_gradient=self.stop_gradient,
                    )

            else:

                def fn(key, x, y, model):
                    k_sure, k_t = jax.random.split(key)
                    # SURE's two evals f(y), f(y + tau*b) run as ONE 2B-sized
                    # forward (bigger GEMMs on the MXU, one dispatch).
                    tau = 1e-2
                    probe_margin = (
                        self.sure_margin if self.sure_cropped_div else 0
                    )
                    b = sample_probe(k_sure, y, probe_margin)
                    pair = model(jnp.concatenate([y, y + b * tau], axis=0))
                    x_net, x_tau = jnp.split(pair, 2, axis=0)
                    loss = sure_gaussian_loss_from_outputs(
                        y,
                        x_net,
                        x_tau,
                        b,
                        A,
                        sigma=sigma,
                        tau=tau,
                        margin=self.sure_margin,
                        cropped_div=self.sure_cropped_div,
                        averaged_cst=self.sure_averaged_cst,
                    )
                    if self.sure_rate_hotfix is not None:
                        loss = self.sure_rate_hotfix**2 * loss
                    # EI term (deepinv EILoss semantics at the ref call site):
                    # x2 = T(x_net) (stop-grad optional); x3 = f(A(x2));
                    # + weight * mse(x3, x2).
                    # Dispatch note: this branch CANNOT join the 2B forward
                    # above — its input A(T(x_net)) depends on x_net's VALUE,
                    # which that forward produces.  Folding all three into
                    # one 3B dispatch would need an extra value-only f(y)
                    # first (4 forwards instead of 3, ~+11 ms at b8 — a net
                    # loss vs the ~2 ms of saved glue).  The 2B+1B structure
                    # is the minimum-dispatch schedule for this objective;
                    # the r2r variant has no such dependency between its
                    # first two evals and IS fused (losses/r2r.py).
                    x2 = t_apply(k_t, x_net)
                    if self.stop_gradient:
                        x2 = jax.lax.stop_gradient(x2)
                    x3 = model(A(x2))
                    return loss + self.alpha_tradeoff * _mse(x3, x2)

        else:
            raise ValueError(f"Unknown method: {method}")

        if not self.crop_training_pairs:
            return fn

        def with_crop(key, x, y, model):
            k_crop, k_loss = jax.random.split(key)
            x, y = crop_pair_batch(
                x, y, size=self.crop_size, xy_size_ratio=self.xy_size_ratio, key=k_crop
            )
            return fn(k_loss, x, y, model)

        return with_crop


def compute_sure_margin(
    *,
    partial_sure: bool,
    sure_margin: Optional[int],
    task: str,
    kernel_shape: Optional[tuple] = None,
    partial_sure_sr: bool = False,
) -> int:
    """Auto margin (ref get_loss, src/losses/__init__.py:212-229)."""
    if not partial_sure:
        assert sure_margin is None
        return 0
    if sure_margin is not None:
        return sure_margin
    if task == "deblurring":
        assert kernel_shape is not None
        kernel_size = max(kernel_shape[-2], kernel_shape[-1])
        return (kernel_size - 1) // 2
    if task == "sr":
        return 2 if partial_sure_sr else 0
    return 0


def get_loss(
    *,
    method: str,
    physics,
    noise_level: float = 5.0,
    partial_sure: bool = True,
    partial_sure_sr: bool = False,
    sure_margin: Optional[int] = None,
    sure_cropped_div: bool = True,
    sure_averaged_cst: Optional[bool] = None,
    stop_gradient: bool = True,
    sure_alternative: Optional[str] = None,
    alpha_tradeoff: float = 1.0,
    transforms: str = "Scaling_Transforms",
    scaling_kind: str = "padded",
    scaling_antialias: bool = False,
    crop_training_pairs: bool = True,
    crop_size: int = 48,
    supervised_l1: bool = False,
    fixed_normal_rate: Optional[float] = None,
    sure_rate_hotfix: bool = False,
) -> Callable:
    """Factory mirroring ref get_loss; returns loss(key, x, y, model)."""
    method, transforms = normalize_method(method, transforms)
    margin = compute_sure_margin(
        partial_sure=partial_sure,
        sure_margin=sure_margin,
        task=physics.task,
        kernel_shape=None if physics.kernel is None else physics.kernel.shape,
        partial_sure_sr=partial_sure_sr,
    )
    cfg = LossConfig(
        method=method,
        noise_level=noise_level,
        sure_cropped_div=sure_cropped_div,
        sure_averaged_cst=bool(sure_averaged_cst),
        sure_margin=margin,
        stop_gradient=stop_gradient,
        sure_alternative=sure_alternative,
        alpha_tradeoff=alpha_tradeoff,
        transforms=transforms,
        scaling_kind=scaling_kind,
        scaling_antialias=scaling_antialias,
        crop_training_pairs=crop_training_pairs,
        crop_size=crop_size,
        xy_size_ratio=physics.rate if physics.task == "sr" else 1,
        supervised_l1=supervised_l1,
        fixed_normal_rate=fixed_normal_rate,
        # explicit spelling of the reference's _TEMPORARY_HOTFIX env var
        # (scales the SURE term by rate^2, ref src/losses/sure.py:68-74)
        sure_rate_hotfix=float(physics.rate) if sure_rate_hotfix else None,
    )
    return cfg.build(physics.A)
