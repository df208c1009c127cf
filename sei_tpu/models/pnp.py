"""Denoiser-prior baselines: PnP (DPIR/HQS), DiffPIR, DPS.

These eval-only baselines (ref src/models/{pnp,diffpir,dps}.py) require a
pretrained DRUNet / DiffUNet denoiser.  The reference downloads weights at
runtime; this environment has no network egress, so construction requires a
local weights file via ``SEI_DRUNET_WEIGHTS`` (torch .pth, converted on
load).  The solver loops themselves are implemented in
:mod:`sei_tpu.models.denoiser_solvers` once a denoiser is available.
"""

from __future__ import annotations

import os


def get_denoiser_model(kind, *, physics, noise_level, task, sr_factor):
    if kind == "DiffPIR_DiffUNet":
        weights = os.environ.get("SEI_DIFFUNET_WEIGHTS")
        needed = (
            "a guided-diffusion UNet checkpoint (e.g. diffusion_ffhq_10m.pt) "
            "via SEI_DIFFUNET_WEIGHTS"
        )
    else:
        weights = os.environ.get("SEI_DRUNET_WEIGHTS")
        needed = "a local drunet_color.pth via SEI_DRUNET_WEIGHTS"
    if not weights or not os.path.exists(weights):
        raise NotImplementedError(
            f"{kind} needs a pretrained denoiser: set {needed} (no network "
            "egress in this environment; the reference downloads weights via "
            "deepinv)."
        )
    from .denoiser_solvers import build_denoiser_baseline

    return build_denoiser_baseline(
        kind,
        weights_path=weights,
        physics=physics,
        noise_level=noise_level,
        task=task,
        sr_factor=sr_factor,
    )
