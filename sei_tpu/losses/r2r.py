"""Recorrupted-to-Recorrupted losses (parity: ref src/losses/r2r.py).

R2R:    mse(A(f(y + alpha*eps)), y - eps/alpha),  eps ~ N(0, eta^2)
R2R-EI: R2R + equivariance with consistent input noise:
        x1 = f(y + 0.5 sigma e1); x2 = T(x1) (optionally stop-grad);
        x3 = f(A(x2) + 1.5 sigma e2); + mse(x3, x2)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _mse(a, b):
    d = a - b
    return jnp.mean(d * d)


def r2r_loss(
    key: jax.Array,
    y: jnp.ndarray,
    model: Callable,
    A: Callable,
    *,
    eta: float,
    alpha: float = 0.5,
) -> jnp.ndarray:
    pert = jax.random.normal(key, y.shape, y.dtype) * eta
    y_plus = y + pert * alpha
    y_minus = y - pert / alpha
    return _mse(A(model(y_plus)), y_minus)


def r2r_ei_loss(
    key: jax.Array,
    y: jnp.ndarray,
    model: Callable,
    A: Callable,
    transform: Callable,
    *,
    sigma: float,
    stop_gradient: bool = True,
) -> jnp.ndarray:
    """R2R + EI with consistent input noise (ref R2REILoss, r2r.py:26-57).

    The R2R eval f(y + alpha*eta*pert) and the EI anchor f(y + 0.5 sigma e1)
    are independent given y, so they run as ONE 2B-sized forward (bigger
    MXU GEMMs, one trunk dispatch instead of two); only the EI branch
    f(A(T(x1)) + e2) stays a separate dispatch because its input depends on
    x1's value.  Numerically identical to the unfused form given the same
    key (same draws; the model is per-image).
    """
    k_r2r, k1, k2, kt = jax.random.split(key, 4)
    alpha = 0.5
    pert = jax.random.normal(k_r2r, y.shape, y.dtype) * sigma
    eps1 = 0.5 * sigma * jax.random.normal(k1, y.shape, y.dtype)

    pair = model(jnp.concatenate([y + pert * alpha, y + eps1], axis=0))
    x_r2r, x1 = jnp.split(pair, 2, axis=0)
    loss = _mse(A(x_r2r), y - pert / alpha)

    x2 = transform(kt, x1)
    if stop_gradient:
        x2 = jax.lax.stop_gradient(x2)
    y2 = A(x2)
    eps2 = 1.5 * sigma * jax.random.normal(k2, y2.shape, y2.dtype)
    x3 = model(y2 + eps2)
    return loss + _mse(x3, x2)


def r2r_ei_loss_unfused(
    key: jax.Array,
    y: jnp.ndarray,
    model: Callable,
    A: Callable,
    transform: Callable,
    *,
    sigma: float,
    stop_gradient: bool = True,
) -> jnp.ndarray:
    """Reference form with three B-sized model calls (golden twin of
    :func:`r2r_ei_loss`; kept for the fused==unfused equivalence test)."""
    k_r2r, k1, k2, kt = jax.random.split(key, 4)
    loss = r2r_loss(k_r2r, y, model, A, eta=sigma, alpha=0.5)

    eps1 = 0.5 * sigma * jax.random.normal(k1, y.shape, y.dtype)
    x1 = model(y + eps1)
    x2 = transform(kt, x1)
    if stop_gradient:
        x2 = jax.lax.stop_gradient(x2)
    y2 = A(x2)
    eps2 = 1.5 * sigma * jax.random.normal(k2, y2.shape, y2.dtype)
    x3 = model(y2 + eps2)
    return loss + _mse(x3, x2)
