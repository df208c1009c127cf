"""Mesh construction and sharding for batch-parallel training.

The reference's only multi-device feature is single-process
``torch.nn.DataParallel`` (ref src/models/__init__.py:142-145).  The
TPU-native equivalent is SPMD over a 1-D ``Mesh(('data',))``: parameters and
optimizer state replicated, the per-step batch sharded over ICI, gradients
reduced by the ``psum`` XLA inserts for the sharded-batch loss.  No
hand-written communication backend is needed (SURVEY.md section 5.8); this
module owns mesh/shardings and the donated-buffer jit wrapper.

Scaling beyond data-parallel (spatial/tensor sharding of big eval images) can
be layered on the same mesh with extra axes; train-time batch sharding is the
axis that matters for the reference's workload.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of batch arrays with leading-axis sharding."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)
