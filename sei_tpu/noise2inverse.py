"""Noise2Inverse eval-time ensemble (parity: ref src/noise2inverse.py).

Row-subsampled measurement splits -> backprojection (fast spectral inverse
filter for deblurring, physics.A_dagger otherwise) -> the backbone applied to
each (K-1)-subset sum -> reconstructions summed.  Also provides the
train-pair transform (wired but unused in reference training - SURVEY.md
section 2.5).
"""

from __future__ import annotations

from itertools import combinations
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .ops.fft_conv import inverse_filter


def measurement_slices(y: jnp.ndarray, num_splits: int) -> list[jnp.ndarray]:
    """Row-comb splits: slice j keeps rows j::num_splits, zeros elsewhere."""
    out = []
    h = y.shape[-2]
    rows = jnp.arange(h)
    for j in range(num_splits):
        mask = ((rows % num_splits) == j).astype(y.dtype)[:, None]
        out.append(y * mask)
    return out


def make_backproject(task: str, kernel, degradation_inverse_fn: Callable) -> Callable:
    if task == "deblurring":
        assert kernel is not None
        return lambda ys: inverse_filter(ys, kernel)
    return degradation_inverse_fn


def noise2inverse_model(
    backbone: Callable,
    *,
    task: str,
    kernel=None,
    degradation_inverse_fn: Optional[Callable] = None,
    num_splits: int = 4,
    strategy: str = "X:1",
) -> Callable:
    """Wrap a reconstruction fn into the N2I subset-sum ensemble."""
    backproject = make_backproject(task, kernel, degradation_inverse_fn)
    num_input = num_splits - 1 if strategy == "X:1" else 1
    input_idxs = list(combinations(range(num_splits), num_input))

    def apply(y):
        slices = measurement_slices(y, num_splits)
        images = [backproject(s) for s in slices]
        recons = []
        for idxs in input_idxs:
            inp = sum(images[j] for j in idxs)
            recons.append(backbone(inp))
        return sum(recons)

    return apply


def noise2inverse_train_pair(
    key: jax.Array,
    y: jnp.ndarray,
    *,
    task: str,
    kernel=None,
    degradation_inverse_fn: Optional[Callable] = None,
    num_splits: int = 4,
    strategy: str = "X:1",
):
    """(target, input) training pair from one measurement (ref :115-149)."""
    backproject = make_backproject(task, kernel, degradation_inverse_fn)
    num_input = num_splits - 1 if strategy == "X:1" else 1
    input_idxs = list(combinations(range(num_splits), num_input))
    slices = measurement_slices(y, num_splits)
    images = jnp.stack([backproject(s) for s in slices])
    pick = jax.random.randint(key, (), 0, len(input_idxs))

    def pair_for(idx):
        idxs = input_idxs[idx]
        tgt_idxs = sorted(set(range(num_splits)) - set(idxs))
        inp = sum(images[j] for j in idxs)
        tgt = sum(images[j] for j in tgt_idxs)
        return tgt, inp

    branches = [lambda i=i: pair_for(i) for i in range(len(input_idxs))]
    return jax.lax.switch(pick, branches)
