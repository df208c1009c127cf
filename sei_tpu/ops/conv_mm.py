"""3x3 SAME convolution as one im2col matmul (MXU-shaped).

Why: the SwinIR trunk is fused into a Pallas kernel (ops/swin_trunk.py),
leaving the seven 3x3 180-channel convs per forward (~75 GFLOP at b8/48px
vs the trunk's ~190) as the dominant cost of the step
(experiments/perf_probe_r3b.py: 8.7 ms fwd glue, ~40 ms bwd glue vs
2.78/4.4 ms for the whole trunk kernel).  XLA's conv lowering at C=180
(not 128-lane aligned) and especially its weight-gradient contraction tile
poorly on the MXU.  In im2col form:

  forward : (B*H*W, 9C) @ (9C, Cout)          -- contraction 9C=1620
  dW      : (9C, B*H*W) @ (B*H*W, Cout)       -- contraction B*H*W=18432
  dX      : (B*H*W, Cout) @ (Cout, 9C) + fold -- 9 shifted adds

every contraction is a large, well-tiled matmul.  The patch tensor is 9x
the activation size, so this path is gated to training-crop-sized inputs;
larger images fall back to lax.conv (XLA's native lowering), keeping eval
memory bounded.

OUTCOME (real-v5e bench triple, 2026-08-17): the hypothesis was WRONG
end-to-end - the proposed train step runs 70.3 img/s with this lowering vs
82.7 img/s with XLA's native conv.  The 9x patch-tensor HBM round-trips
outweigh the matmul shape win.  The module stays as a tested, env-gated
(SEI_CONV_MM=1) alternative and a record of the measurement; default OFF.

Parity contract: replaces torch's Conv2d(3x3, padding=1) used throughout
the reference SwinIR (deepinv vendored; configured at
/root/reference/src/models/__init__.py:51-74).  Param layout is identical
to flax nn.Conv (HWIO kernel + bias), so checkpoints are interchangeable.
"""

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Above this many pixels per image the 9x patch tensor stops paying for
# itself (and eval-sized images would blow HBM); use XLA's native conv.
_MM_MAX_PIXELS = 96 * 96


def conv3x3_mm(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None):
    """3x3 SAME conv, NHWC, via one im2col matmul.

    x: (B, H, W, Cin); w: (3, 3, Cin, Cout) (HWIO, as flax nn.Conv);
    b: (Cout,) or None.  Accumulates in f32 (preferred_element_type) and
    returns x.dtype, matching nn.Conv's dtype behavior.
    """
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # tap order (i-major, then j, then c) matches w.reshape(9*cin, cout)
    taps = [xp[:, i : i + h, j : j + wd, :] for i in range(3) for j in range(3)]
    patches = jnp.concatenate(taps, axis=-1).reshape(bsz * h * wd, 9 * cin)
    y = jax.lax.dot_general(
        patches,
        w.reshape(9 * cin, cout).astype(x.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = y.reshape(bsz, h, wd, cout)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def conv3x3_taps(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None):
    """3x3 SAME conv, NHWC, as 9 shifted dot_generals (no patch tensor).

    Same contract as conv3x3_mm, but instead of materializing the 9x im2col
    patch tensor in HBM it contracts each of the 9 taps directly on the
    channel axis:

      forward : 9 x (B*H*W, Cin) @ (Cin, Cout), accumulated in f32
      dW      : 9 x (Cin, B*H*W) @ (B*H*W, Cout)  (autodiff of dot_general)
      dX      : 9 x (B*H*W, Cout) @ (Cout, Cin) + shifted adds
                (autodiff of the pad/slice = dynamic_update_slice adds)

    This keeps HBM traffic at ~1x the activation per tap read (XLA fuses the
    slice into the matmul operand) while every contraction stays MXU-shaped.
    Motivated by the conv_mm measurement above: the patch tensor, not the
    matmul shapes, was the regression.
    """
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wt = w.astype(x.dtype)
    acc = None
    for i in range(3):
        for j in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, i, j, 0), (bsz, h, wd, cin))
            part = jax.lax.dot_general(
                xs, wt[i, j],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    y = acc.astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


@jax.custom_vjp
def _conv3x3_hybrid_core(x: jnp.ndarray, w: jnp.ndarray):
    return conv3x3_taps(x, w, None)


def _hybrid_fwd(x, w):
    return conv3x3_taps(x, w, None), (x, w)


def _hybrid_bwd(res, dy):
    # Transpose through XLA's NATIVE conv lowerings (conv-with-flipped-
    # kernel for dX, conv_backprop_filter for dW) via linear_transpose —
    # no forward recompute.  Measured on v5e (perf_probe_r3z): the 9-tap
    # forward beats native (2.03 vs 2.93 ms for the 7-conv chain) but its
    # autodiff backward loses (3.76 vs 3.27 grad total); this pairs the
    # winner of each direction.
    x, w = res
    dx = jax.linear_transpose(lambda xx: _conv3x3_lax(xx, w, None), x)(dy)[0]
    dw = jax.linear_transpose(lambda ww: _conv3x3_lax(x, ww, None), w)(dy)[0]
    return dx, dw


_conv3x3_hybrid_core.defvjp(_hybrid_fwd, _hybrid_bwd)


def conv3x3_hybrid(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None):
    """3x3 SAME conv: 9-tap shift-matmul forward, native-conv backward."""
    y = _conv3x3_hybrid_core(x, w)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _conv3x3_lax(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None):
    """XLA-native 3x3 SAME conv (same contract as conv3x3_mm)."""
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


class Conv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3, 3), padding="SAME")`` that picks
    the im2col-matmul lowering on TPU training crops.

    Param names/shapes are identical to nn.Conv ("kernel" HWIO + "bias"),
    so checkpoints convert transparently.  ``use_mm=None`` auto-gates: on
    for TPU backends when the image fits the patch-tensor budget.
    """

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Any = None
    use_mm: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", self.kernel_init, (3, 3, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        use_mm = self.use_mm
        if use_mm is None:
            import os

            env_hybrid = os.environ.get("SEI_CONV_HYBRID")
            if env_hybrid is not None and env_hybrid not in ("0", "false", ""):
                if x.shape[1] * x.shape[2] <= _MM_MAX_PIXELS:
                    return conv3x3_hybrid(x, w, b)
                return _conv3x3_lax(x, w, b)
            env_taps = os.environ.get("SEI_CONV_TAPS")
            if env_taps is not None and env_taps not in ("0", "false", ""):
                if x.shape[1] * x.shape[2] <= _MM_MAX_PIXELS:
                    return conv3x3_taps(x, w, b)
                return _conv3x3_lax(x, w, b)
            env = os.environ.get("SEI_CONV_MM")
            if env is not None:
                use_mm = env not in ("0", "false", "")
            else:
                # default OFF: measured END-TO-END on the real v5e
                # (2026-08-17 bench triple, proposed step b8/48px bf16)
                # the im2col lowering is a 15% REGRESSION - 70.3 img/s
                # vs 82.7 with XLA's native conv.  The 9x patch-tensor
                # HBM traffic costs more than the better-shaped matmuls
                # save; XLA's conv lowering at C=180 is adequate after
                # all.  Kept behind SEI_CONV_MM=1 for re-evaluation on
                # other chips/shapes.
                use_mm = False
        if use_mm and x.shape[1] * x.shape[2] <= _MM_MAX_PIXELS:
            return conv3x3_mm(x, w, b)
        return _conv3x3_lax(x, w, b)
