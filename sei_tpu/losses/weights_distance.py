"""Fine-tuning regularizer: mean MSE to frozen pretrained params.

Parity: ref src/losses/weights_distance_loss.py:6-29 - mean over parameter
tensors of per-tensor MSE, scaled by lambda.  Pytree-native here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weights_distance_loss(params, pretrained_params, lambd: float = 1.0) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(params)
    ref_leaves = jax.tree_util.tree_leaves(pretrained_params)
    assert len(leaves) == len(ref_leaves)
    total = jnp.zeros((), dtype=jnp.float32)
    for p, q in zip(leaves, ref_leaves):
        d = p.astype(jnp.float32) - q.astype(jnp.float32)
        total = total + jnp.mean(d * d)
    return lambd * total / len(leaves)
