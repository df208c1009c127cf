"""Fused window attention: Pallas TPU kernel with custom VJP.

The hot op of SwinIR training (ref call stack SURVEY.md section 3.1: three
model evaluations per step, each with 36 windowed-MSA blocks).  XLA's
lowering materializes the (B_, heads, N, N) attention maps in HBM for both
forward and backward; this kernel computes softmax(q k^T + bias (+ mask)) v
entirely in VMEM, G windows per grid step (heads folded into the single
Mosaic-supported batch dim), and the custom VJP recomputes the probabilities
in the backward kernel (flash-attention style, exact for N = 64).  Measured
2x over the XLA lowering in isolation on a v5e.

Layouts: q, k, v are (B_, nh, N, hd); bias (nh, N, N); optional mask
(nW, N, N) with windows ordered batch-major (B_ = B * nW).  ``q`` must be
pre-scaled.  Falls back to a pure-XLA implementation off-TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xla_attention(q, k, v, bias, mask):
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        b_, nh, n, _ = attn.shape
        nw = mask.shape[0]
        m = jnp.asarray(mask, dtype=attn.dtype)
        attn = attn.reshape(b_ // nw, nw, nh, n, n) + m[None, :, None]
        attn = attn.reshape(b_, nh, n, n)
    p = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


def _pick_group(b_: int, nw: Optional[int], max_g: int = 12) -> int:
    """Largest G <= max_g dividing B_ (and nW when masked) - VMEM budget."""
    for g in range(max_g, 0, -1):
        if b_ % g == 0 and (nw is None or nw % g == 0):
            return g
    return 1


def _softmax_probs(q, k, bias, mask_blk, g, nh, n):
    """(G*nh, N, N) probabilities in f32; q/k are (G*nh, N, hd)."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    b = jnp.broadcast_to(bias[None], (g, nh, n, n)).reshape(g * nh, n, n)
    s = s + b.astype(jnp.float32)
    if mask_blk is not None:
        m = jnp.broadcast_to(mask_blk[:, None], (g, nh, n, n)).reshape(g * nh, n, n)
        s = s + m.astype(jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref):
    g, nh, n, hd = q_ref.shape
    q = q_ref[...].reshape(g * nh, n, hd)
    k = k_ref[...].reshape(g * nh, n, hd)
    v = v_ref[...].reshape(g * nh, n, hd)
    mask_blk = None if mask_ref is None else mask_ref[...]
    p = _softmax_probs(q, k, bias_ref[...], mask_blk, g, nh, n)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o.reshape(g, nh, n, hd).astype(o_ref.dtype)


def _specs(b_, nh, n, hd, g, nw):
    qkv_spec = pl.BlockSpec((g, nh, n, hd), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((nh, n, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    mask_spec = None
    if nw is not None:
        blocks_per_img = nw // g
        mask_spec = pl.BlockSpec(
            (g, n, n), lambda i: (i % blocks_per_img, 0, 0),
            memory_space=pltpu.VMEM,
        )
    return qkv_spec, bias_spec, mask_spec


def _fwd_pallas(q, k, v, bias, mask, *, interpret=False):
    b_, nh, n, hd = q.shape
    nw = None if mask is None else mask.shape[0]
    g = _pick_group(b_, nw)
    qkv_spec, bias_spec, mask_spec = _specs(b_, nh, n, hd, g, nw)
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
    args = [q, k, v, bias]
    if mask is not None:
        in_specs.append(mask_spec)
        args.append(jnp.asarray(mask))
        kernel = _fwd_kernel
    else:
        kernel = lambda qr, kr, vr, br, orf: _fwd_kernel(qr, kr, vr, br, None, orf)
    return pl.pallas_call(
        kernel,
        grid=(b_ // g,),
        in_specs=in_specs,
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(*args)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref):
    i = pl.program_id(0)
    g, nh, n, hd = q_ref.shape

    @pl.when(i == 0)
    def _():
        dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)

    q = q_ref[...].reshape(g * nh, n, hd)
    k = k_ref[...].reshape(g * nh, n, hd)
    v = v_ref[...].reshape(g * nh, n, hd)
    do = do_ref[...].reshape(g * nh, n, hd).astype(jnp.float32)
    mask_blk = None if mask_ref is None else mask_ref[...]
    p = _softmax_probs(q, k, bias_ref[...], mask_blk, g, nh, n)

    dv = jax.lax.dot_general(
        p, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # per-batch p^T @ do: (G*nh, N, hd)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G*nh, N, N)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dk = jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dq_ref[...] = dq.reshape(g, nh, n, hd).astype(dq_ref.dtype)
    dk_ref[...] = dk.reshape(g, nh, n, hd).astype(dk_ref.dtype)
    dv_ref[...] = dv.reshape(g, nh, n, hd).astype(dv_ref.dtype)
    dbias_ref[...] += jnp.sum(ds.reshape(g, nh, n, n), axis=0)


def _bwd_pallas(q, k, v, bias, mask, do, *, interpret=False):
    b_, nh, n, hd = q.shape
    nw = None if mask is None else mask.shape[0]
    g = _pick_group(b_, nw, max_g=8)  # bwd holds more live tensors
    qkv_spec, bias_spec, mask_spec = _specs(b_, nh, n, hd, g, nw)
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
    args = [q, k, v, bias]
    has_mask = mask is not None
    if has_mask:
        in_specs.append(mask_spec)
        args.append(jnp.asarray(mask))
    in_specs.append(qkv_spec)
    args.append(do)

    def kernel(*refs):
        if has_mask:
            qr, kr, vr, br, mr, dor, dqr, dkr, dvr, dbr = refs
            _bwd_kernel(qr, kr, vr, br, mr, dor, dqr, dkr, dvr, dbr)
        else:
            qr, kr, vr, br, dor, dqr, dkr, dvr, dbr = refs
            _bwd_kernel(qr, kr, vr, br, None, dor, dqr, dkr, dvr, dbr)

    out_shapes = (
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
        jax.ShapeDtypeStruct((nh, n, n), jnp.float32),
    )
    out_specs = (
        qkv_spec,
        qkv_spec,
        qkv_spec,
        pl.BlockSpec((nh, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid=(b_ // g,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _window_attention_pallas(q, k, v, bias, mask, interpret):
    return _fwd_pallas(q, k, v, bias, mask, interpret=interpret)


def _wa_fwd(q, k, v, bias, mask, interpret):
    out = _fwd_pallas(q, k, v, bias, mask, interpret=interpret)
    return out, (q, k, v, bias)


def _wa_bwd(mask, interpret, res, do):
    q, k, v, bias = res
    dq, dk, dv, dbias = _bwd_pallas(q, k, v, bias, mask, do, interpret=interpret)
    return dq, dk, dv, dbias.astype(bias.dtype)


_window_attention_pallas.defvjp(_wa_fwd, _wa_bwd)


def _pallas_default() -> bool:
    """Opt-in (SEI_PALLAS_ATTN=1).  Measured on a v5e at SwinIR's window
    shapes (N=64, hd=30): the kernel wins 2x in isolation, but inside the
    full train graph XLA's fusion with surrounding ops plus the custom-VJP
    recompute cost makes the end-to-end step ~10% slower (27.6 vs 30.8
    img/s, round-1 bench).  Revisit for larger windows / real multi-chip."""
    import os

    if os.environ.get("SEI_PALLAS_ATTN") == "1":
        try:
            return jax.default_backend() in ("tpu", "axon")
        except Exception:
            return False
    return False


def window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[np.ndarray] = None,
    *,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T + bias (+mask)) v over windows.

    q/k/v: (B_, nh, N, hd) with q pre-scaled; bias (nh, N, N);
    mask (nW, N, N) numpy constant or None (B_ must be a multiple of nW).
    """
    if use_pallas is None:
        use_pallas = _pallas_default()
    if not use_pallas:
        m = None if mask is None else jnp.asarray(mask, dtype=jnp.float32)
        return _xla_attention(q, k, v, bias, m)
    # mask must be a trace-time constant (numpy), not a tracer: it rides in
    # custom_vjp nondiff_argnums and becomes a literal in the kernels.
    if mask is not None:
        assert isinstance(mask, np.ndarray), "mask must be a numpy constant"
        mask = np.ascontiguousarray(mask, dtype=np.float32)
    return _window_attention_pallas(q, k, v, bias.astype(jnp.float32), mask, interpret)
