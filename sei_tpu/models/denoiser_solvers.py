"""Denoiser-prior solvers: DPIR/HQS (PnP), DiffPIR, DPS.

Eval-only reconstruction baselines matching the reference's model kinds
(ref src/models/pnp.py, diffpir.py, dps.py).  All loops are lax.fori_loop
inside one jitted graph; the data-fidelity prox uses closed-form FFT
solutions for circular blur and CG elsewhere.

These require pretrained DRUNet weights (see models/pnp.py for gating).
"""

from __future__ import annotations

import math

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fft_conv import psf_to_otf
from .drunet import DRUNet, torch_drunet_to_flax


def make_drunet_denoiser(weights_path: str):
    """Torch drunet_color.pth (the published weights) or the native .npz
    format written by drunet.save_drunet_native (locally trained, e.g. in
    no-egress environments - see experiments/train_drunet.py)."""
    if weights_path.endswith(".npz"):
        from .drunet import load_drunet_native

        params, net = load_drunet_native(weights_path)
    else:
        from .torch_io import load_torch_file

        sd = load_torch_file(weights_path)
        params = torch_drunet_to_flax(sd)
        net = DRUNet()

    def denoise(x, sigma):
        return net.apply({"params": params}, x, sigma)

    return denoise


def make_diffunet_denoiser(weights_path: str):
    """deepinv DiffUNet denoiser interface from a guided-diffusion ckpt
    (the reference's DiffPIR_DiffUNet denoiser, ref src/models/diffpir.py:20-25).
    """
    from .diffunet import (
        DiffUNet,
        diffunet_config_from_state_dict,
        diffunet_denoise,
        torch_diffunet_to_flax,
    )
    from .torch_io import load_torch_file

    sd = load_torch_file(weights_path)
    cfg = diffunet_config_from_state_dict(sd)
    params = torch_diffunet_to_flax(sd)
    net = DiffUNet(cfg=cfg)
    apply_fn = lambda p, x, t: net.apply({"params": p}, x, t)

    mult = 2 ** (len(cfg.channel_mult) - 1)

    def denoise(x, sigma):
        return diffunet_denoise(apply_fn, params, x, sigma, multiple=mult)

    return denoise


def _prox_l2_blur(z, y, kernel, gamma):
    """argmin_x ||A x - y||^2 + gamma ||x - z||^2 for circular blur (FFT)."""
    shape = z.shape[-2:]
    otf = psf_to_otf(kernel.astype(z.dtype), shape)
    num = jnp.conj(otf) * jnp.fft.rfft2(y, axes=(-2, -1)) + gamma * jnp.fft.rfft2(
        z, axes=(-2, -1)
    )
    den = jnp.abs(otf) ** 2 + gamma
    return jnp.fft.irfft2(num / den, s=shape, axes=(-2, -1))


def _prox_l2_cg(z, y, physics, gamma, iters: int = 20):
    """Generic prox via CG on (A^T A + gamma I) x = A^T y + gamma z."""
    rhs = physics.A_adjoint(y) + gamma * z

    def mv(v):
        return physics.A_adjoint(physics.A(v)) + gamma * v

    def body(_, state):
        xk, r, p, rs = state
        ap = mv(p)
        alpha = rs / (jnp.vdot(p, ap).real + 1e-12)
        xk = xk + alpha * p
        r = r - alpha * ap
        rs_new = jnp.vdot(r, r).real
        p = r + (rs_new / (rs + 1e-12)) * p
        return xk, r, p, rs_new

    x0 = z
    r0 = rhs - mv(x0)
    state = (x0, r0, r0, jnp.vdot(r0, r0).real)
    xk, *_ = jax.lax.fori_loop(0, iters, body, state)
    return xk


def make_data_prox(physics) -> Callable:
    if physics.task == "deblurring" and physics.v2:
        return lambda z, y, gamma: _prox_l2_blur(z, y, physics.kernel, gamma)
    return lambda z, y, gamma: _prox_l2_cg(z, y, physics, gamma)


def dpir_hqs(y, physics, denoiser, *, noise_level_img: float, iters: int = 8,
             lamb: float = 0.23, sigma1: float = 49.0 / 255.0):
    """DPIR half-quadratic splitting (PnP with DRUNet).

    sigma_k log-spaced sigma1 -> noise_level_img; per-step data prox weight
    gamma_k = lamb * (noise_level_img / sigma_k)^2 (Zhang et al. 2021 recipe
    consumed via deepinv at ref src/models/pnp.py:11-53).
    """
    sigmas = np.logspace(
        math.log10(sigma1), math.log10(max(noise_level_img, 1e-4)), iters
    )
    prox = make_data_prox(physics)
    x = physics.A_adjoint(y)
    for s in sigmas:
        gamma = lamb * (max(noise_level_img, 1e-4) / s) ** 2
        x = prox(x, y, gamma)
        x = denoiser(x, float(s))
    return x


def diffpir(y, physics, denoiser, *, noise_level_img: float, steps: int = 100,
            lambda_: float = 7.0, zeta: float = 0.3, key=None):
    """DiffPIR sampler (Zhu et al. 2023) with a denoiser-as-score model."""
    key = jax.random.PRNGKey(0) if key is None else key
    t_start = 999
    betas = np.linspace(0.1 / 1000, 20 / 1000, 1000)
    alphas = np.cumprod(1 - betas)
    seq = np.linspace(0, t_start, steps).astype(int)[::-1]
    prox = make_data_prox(physics)

    x = physics.A_adjoint(y)
    k0, key = jax.random.split(key)
    a_T = alphas[seq[0]]
    x = jnp.sqrt(a_T) * x + jnp.sqrt(1 - a_T) * jax.random.normal(k0, x.shape, x.dtype)

    for i, t in enumerate(seq):
        a_t = alphas[t]
        sigma_t = math.sqrt((1 - a_t) / a_t)
        # predict x0 via the denoiser
        x0 = denoiser(x / math.sqrt(a_t), sigma_t)
        # data-consistency prox
        rho = lambda_ * (noise_level_img**2) / max(sigma_t**2, 1e-8)
        x0 = prox(x0, y, rho)
        if i < len(seq) - 1:
            t_next = seq[i + 1]
            a_next = alphas[t_next]
            key, kn = jax.random.split(key)
            eps = (x - math.sqrt(a_t) * x0) / math.sqrt(max(1 - a_t, 1e-8))
            noise = jax.random.normal(kn, x.shape, x.dtype)
            eps_mix = math.sqrt(1 - zeta) * eps
            x = (
                math.sqrt(a_next) * x0
                + math.sqrt(1 - a_next) * (eps_mix + math.sqrt(zeta) * noise)
            )
        else:
            x = x0
    return x


def dps(y, physics, denoiser, *, steps: int = 100, eta: float = 1.0, key=None):
    """Diffusion posterior sampling (Chung et al. 2023), denoiser score.

    Matches the deepinv DPS sampler the reference wraps (ref
    src/models/dps.py:9-21): the diffusion runs in the scaled space
    z = 2x - 1 with the [0,1] denoiser bridged via z/2 + 0.5 and
    sigma/2, the x0 estimate is clipped to [-1, 1] each step, and the
    transition is the eta-noised DDIM update with the likelihood
    gradient of sqrt(||A(x0)-y||^2) subtracted (the 1/||r|| guidance
    normalization of the DPS paper).
    """
    key = jax.random.PRNGKey(0) if key is None else key
    betas = np.linspace(0.1 / 1000, 20 / 1000, 1000)
    alphas = np.cumprod(1 - betas)
    seq = np.linspace(0, 999, steps).astype(int)[::-1]

    # measurement in the scaled space: A(2x-1) = 2A(x) - A(1)
    ones = jnp.ones_like(physics.A_adjoint(y))
    yz = 2.0 * y - physics.A(ones)

    k0, key = jax.random.split(key)
    x = jax.random.normal(k0, ones.shape, y.dtype)

    for i, t in enumerate(seq):
        a_t = alphas[t]
        sigma_t = math.sqrt((1 - a_t) / a_t)

        def x0_of(xt):
            z = xt / math.sqrt(a_t)
            x0 = 2.0 * denoiser(z / 2.0 + 0.5, sigma_t / 2.0) - 1.0
            return jnp.clip(x0, -1.0, 1.0)

        # likelihood gradient through the denoiser
        def residual_norm(xt):
            r = physics.A(x0_of(xt)) - yz
            return jnp.sqrt(jnp.sum(r * r) + 1e-12)

        norm, g = jax.value_and_grad(residual_norm)(x)
        x0 = x0_of(x)
        if i < len(seq) - 1:
            t_next = seq[i + 1]
            a_next = alphas[t_next]
            key, kn = jax.random.split(key)
            sigma_tilde = (
                math.sqrt(
                    max((1 - a_t / a_next) * (1 - a_next) / (1 - a_t), 0.0)
                )
                * eta
            )
            c2 = math.sqrt(max((1 - a_next) - sigma_tilde**2, 0.0))
            eps = (x - math.sqrt(a_t) * x0) / math.sqrt(max(1 - a_t, 1e-8))
            noise = jax.random.normal(kn, x.shape, x.dtype)
            x = (
                math.sqrt(a_next) * x0
                + c2 * eps
                + sigma_tilde * noise
                - g
            )
        else:
            x = x0
    return (x + 1.0) / 2.0


def build_denoiser_baseline(kind, *, weights_path, physics, noise_level, task,
                            sr_factor):
    from . import FunctionalModel

    if kind == "DiffPIR_DiffUNet":
        # guided-diffusion UNet denoiser (ref src/models/diffpir.py:20-25).
        # Size handling deviates deliberately from the reference (which
        # reflect-pads y once around the whole DiffPIR solve): here the
        # denoiser itself edge-pads each input to the UNet's downsample
        # multiple 2^(L-1) and crops the estimate back (DRUNet-style,
        # diffunet.py:diffunet_denoise) — so the data-consistency steps run
        # at the true measurement size.
        denoiser = make_diffunet_denoiser(weights_path)
    else:
        denoiser = make_drunet_denoiser(weights_path)
    sigma = noise_level / 255.0

    if kind == "PlugAndPlay":
        fn = lambda y: dpir_hqs(y, physics, denoiser, noise_level_img=sigma)
    elif kind in ("DiffPIR_DRUNet", "DiffPIR_DiffUNet"):
        fn = lambda y: diffpir(y, physics, denoiser, noise_level_img=sigma)
    elif kind == "DPS":
        fn = lambda y: dps(y, physics, denoiser)
    else:
        raise ValueError(kind)
    return FunctionalModel(fn, kind)
