"""Spatial halo tiling: exactness for local models, mesh sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from sei_tpu.parallel import make_mesh
from sei_tpu.parallel.tiling import tiled_apply


def _local_conv_model(key, k=5, layers=2):
    ks = jax.random.split(key, layers)
    kernels = [
        jax.random.normal(kk, (3, 3, k, k)) * (1.0 / (3 * k * k)) for kk in ks
    ]

    def apply(x):
        for w in kernels:
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
            )
            x = jax.nn.gelu(x)
        return x

    return apply


def test_tiled_apply_exact_for_local_model():
    key = jax.random.PRNGKey(0)
    model = _local_conv_model(key)
    y = jax.random.uniform(jax.random.fold_in(key, 1), (1, 3, 63, 32))
    want = model(y)
    # receptive field of 2 5x5 convs = 4 px halo needed; use 8
    got = tiled_apply(model, y, n_tiles=4, halo=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_tiled_apply_sr_scale():
    def up2(x):
        return jnp.repeat(jnp.repeat(x, 2, -1), 2, -2)

    y = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 48, 24))
    got = tiled_apply(up2, y, n_tiles=3, halo=4, out_scale=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(up2(y)), atol=1e-6)


def test_tiled_apply_sharded_over_mesh():
    mesh = make_mesh()
    model = _local_conv_model(jax.random.PRNGKey(3))
    y = jax.random.uniform(jax.random.PRNGKey(4), (1, 3, 64, 32))
    fn = jax.jit(lambda y: tiled_apply(model, y, n_tiles=8, halo=8, mesh=mesh))
    got = fn(y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(model(y)), atol=1e-5)
