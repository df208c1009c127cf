"""Forward operators (physics) as pure functions over pytrees.

The reference threads a stateful ``LinearPhysics`` object (with ``.A``,
``.A_adjoint``, ``.A_dagger``, ``.noise_model``) through datasets, losses and
models (ref src/physics/__init__.py:29-102).  The TPU-native equivalent is a
:class:`Physics` pytree of static config + kernel arrays whose methods are
pure jittable functions; seeded degradation uses explicit JAX keys
(``jax.random.fold_in``) instead of forked global RNG state
(ref src/physics/__init__.py:65-74).
"""

from __future__ import annotations

import dataclasses
import os

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import blur_circular, blur_circular_adjoint, get_kernel, inverse_filter
from ..ops.fft_conv import ct_like_filter
from ..ops.resize import resize
from .conv import blur_spatial, blur_spatial_adjoint

TASKS = ("deblurring", "sr", "invert_a_tomography_like_filter")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Physics:
    """A linear forward operator with Gaussian measurement noise.

    Attributes:
      task: "deblurring" | "sr" | "invert_a_tomography_like_filter".
      kernel: PSF array for blur tasks (data field), else None.
      sigma: noise std in [0,1] units (noise_level/255).
      rate: SR downsampling rate (static), None otherwise.
      v2: FFT circular blur (default) vs spatial circular conv
          (ref --physics_v2, src/settings.py:66).
      true_adjoint: exact adjoint for SR (vs deprecated bicubic upsample)
          (ref src/physics/downsampling/__init__.py:21-35).
    """

    kernel: Optional[jnp.ndarray] = None
    task: str = dataclasses.field(default="deblurring", metadata={"static": True})
    sigma: float = dataclasses.field(default=5.0 / 255.0, metadata={"static": True})
    rate: Optional[int] = dataclasses.field(default=None, metadata={"static": True})
    v2: bool = dataclasses.field(default=True, metadata={"static": True})
    true_adjoint: bool = dataclasses.field(default=False, metadata={"static": True})
    antialias: bool = dataclasses.field(default=True, metadata={"static": True})

    # -- forward operator ---------------------------------------------------
    def A(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.task == "deblurring":
            if self.v2:
                return blur_circular(x, self.kernel)
            return blur_spatial(x, self.kernel, padding="circular")
        if self.task == "sr":
            return resize(x, scale_factor=1.0 / self.rate, antialias=self.antialias)
        return ct_like_filter(x, inverse=True)

    def A_adjoint(self, y: jnp.ndarray) -> jnp.ndarray:
        if self.task == "deblurring":
            if self.v2:
                return blur_circular_adjoint(y, self.kernel)
            return blur_spatial_adjoint(y, self.kernel, padding="circular")
        if self.task == "sr":
            if self.true_adjoint:
                # Exact adjoint via linear transposition of the resize
                # (conceptual match of deepinv adjoint_function,
                # ref src/physics/downsampling/__init__.py:21-31).
                up = self.rate
                in_shape = (*y.shape[:-2], y.shape[-2] * up, y.shape[-1] * up)
                t = jax.linear_transpose(
                    lambda x: resize(
                        x, scale_factor=1.0 / up, antialias=self.antialias
                    ),
                    jax.ShapeDtypeStruct(in_shape, y.dtype),
                )
                return t(y)[0]
            # Deprecated reference behavior: plain bicubic upsample.
            return resize(y, scale_factor=float(self.rate), antialias=False)
        # CT-like filter is self-adjoint up to the real ramp (diagonal in
        # Fourier), so adjoint == forward.
        return ct_like_filter(y, inverse=True)

    def A_dagger(self, y: jnp.ndarray) -> jnp.ndarray:
        """Least-squares pseudo-inverse (used by InverseFilter / N2I eval)."""
        if self.task == "deblurring":
            return inverse_filter(y, self.kernel)
        if self.task == "invert_a_tomography_like_filter":
            return ct_like_filter(y, inverse=False)
        # SR: conjugate gradient on the normal equations A A^T z = y.
        return self._dagger_cg(y)

    def _dagger_cg(self, y: jnp.ndarray, iters: int = 50) -> jnp.ndarray:
        def aat(z):
            return self.A(self.A_adjoint(z))

        def body(_, state):
            z, r, p, rs = state
            ap = aat(p)
            alpha = rs / (jnp.vdot(p, ap).real + 1e-12)
            z = z + alpha * p
            r = r - alpha * ap
            rs_new = jnp.vdot(r, r).real
            p = r + (rs_new / (rs + 1e-12)) * p
            return z, r, p, rs_new

        z0 = jnp.zeros_like(y)
        r0 = y
        state = (z0, r0, r0, jnp.vdot(r0, r0).real)
        z, *_ = jax.lax.fori_loop(0, iters, body, state)
        return self.A_adjoint(z)

    # -- noise --------------------------------------------------------------
    def add_noise(self, y: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        return y + self.sigma * jax.random.normal(key, y.shape, y.dtype)

    def degrade(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """y = A(x) + sigma * n, the reference's ``physics(x)``."""
        return self.add_noise(self.A(x), key)

    def randomly_degrade(self, x: jnp.ndarray, key: jax.Array, seed) -> jnp.ndarray:
        """Seeded degradation (ref PhysicsManager.randomly_degrade).

        ``seed`` may be a traced int array; per-image determinism comes from
        folding it into the key, reproducing the reference's frozen
        measurements (ref src/datasets/synthetic_dataset.py:30-41).
        """
        if seed is not None:
            key = jax.random.fold_in(key, seed)
        return self.degrade(x, key)


def get_physics(
    *,
    task: str,
    noise_level: float = 5.0,
    kernel: str | np.ndarray | None = None,
    sr_factor: int | None = None,
    physics_v2: bool = True,
    physics_true_adjoint: bool = False,
    antialias: bool = True,
    dtype=jnp.float32,
) -> Physics:
    """Factory mirroring ref get_physics (src/physics/__init__.py:80-102)."""
    assert task in TASKS, f"Unknown task: {task}"
    k = None
    if task == "deblurring":
        if isinstance(kernel, str):
            if os.path.exists(kernel):
                k = _load_kernel_file(kernel)
            else:
                k = get_kernel(kernel)
        elif kernel is not None:
            k = np.asarray(kernel)
        else:
            raise ValueError("deblurring requires a kernel")
        k = jnp.asarray(k, dtype=dtype)
    if task == "sr" and sr_factor is None:
        raise ValueError("sr requires sr_factor")
    return Physics(
        kernel=k,
        task=task,
        sigma=float(noise_level) / 255.0,
        rate=sr_factor,
        v2=physics_v2,
        true_adjoint=physics_true_adjoint,
        antialias=antialias,
    )


def _load_kernel_file(path: str) -> np.ndarray:
    """Load a kernel from .npy or a torch .pt file (reference compat)."""
    if path.endswith(".npy"):
        return np.load(path)
    import torch  # local import: torch is host-side IO only

    t = torch.load(path, map_location="cpu", weights_only=False)
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
