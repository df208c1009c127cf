"""Spatial tiling with halo overlap: multi-device (or memory-bounded) eval.

The reference has no sequence/context parallelism and doesn't need it
(SURVEY.md section 5.7); the TPU-relevant analog for imaging is *spatial*
sharding of large eval images.  ``tiled_apply`` splits the output height into
strips; each strip is computed from a fixed-size input window CLAMPED inside
the image (so the model sees the true image boundary wherever its receptive
field reaches it), and the valid centers are stitched back together.

Exact for models whose receptive field is <= halo (conv nets, regardless of
their boundary padding); for SwinIR a halo of ~2-3 RSTB receptive fields
(64-128 px) makes residual boundary effects negligible.  Not applicable to
globally-coupled ops (the ConvUNet's spectral resampler).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp


def tiled_apply(
    model_fn: Callable,
    y: jnp.ndarray,
    *,
    n_tiles: int,
    halo: int,
    out_scale: int = 1,
    mesh=None,
) -> jnp.ndarray:
    """Apply ``model_fn`` to (1, C, H, W) by H-strips with halo overlap.

    model_fn maps (B', C, h, w) -> (B', C, h*out_scale, w*out_scale).
    With ``mesh``, the strip batch is sharded over the 'data' axis so each
    device computes its strips (eval-time data parallelism over space).
    Requires H >= ceil(H/n_tiles) + 2*halo.
    """
    b, c, h, w = y.shape
    assert b == 1, "tiled_apply operates on a single image"
    strip = math.ceil(h / n_tiles)
    win = strip + 2 * halo
    assert win <= h, (
        f"tile window {win} exceeds image height {h}; lower n_tiles or halo"
    )

    starts = []
    offsets = []  # where each strip's output begins inside its window
    out_starts = []  # clamped: the last strip slides back, overlapping
    for i in range(n_tiles):
        out_start = min(i * strip, h - strip)
        s = min(max(out_start - halo, 0), h - win)
        starts.append(s)
        offsets.append(out_start - s)
        out_starts.append(out_start)

    tiles = jnp.stack(
        [
            jax.lax.dynamic_slice(y, (0, 0, s, 0), (1, c, win, w))[0]
            for s in starts
        ]
    )  # (n_tiles, C, win, W)

    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        tiles = jax.lax.with_sharding_constraint(
            tiles, NamedSharding(mesh, P("data"))
        )

    out_tiles = model_fn(tiles)  # (n_tiles, C, win*s, W*s)
    sc = out_scale
    # Overlapping strips write identical values on the overlap, so the
    # stitched result is exact wherever the halo covers the receptive field.
    full = jnp.zeros((1, c, h * sc, w * sc), out_tiles.dtype)
    for i in range(n_tiles):
        core = jax.lax.dynamic_slice(
            out_tiles[i], (0, offsets[i] * sc, 0), (c, strip * sc, w * sc)
        )
        full = jax.lax.dynamic_update_slice(
            full, core[None], (0, 0, out_starts[i] * sc, 0)
        )
    return full
