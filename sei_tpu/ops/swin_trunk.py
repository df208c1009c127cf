"""Fused Swin trunk: D successive SwinBlocks as ONE Pallas TPU kernel.

Why: the flagship SwinIR (ref src/models/__init__.py:51-74) runs 36 small
attention blocks per forward; XLA lowers each to ~20 kernels on 48px crops,
so the train step is per-op-overhead/bandwidth bound at ~8% MFU (round-2
probes: fwd b8 = 19ms vs a ~2.3ms bf16 roofline).  This kernel computes all
``D`` blocks of one RSTB for one image entirely in VMEM: activations never
round-trip to HBM between blocks, and ~20*D XLA ops collapse into D/2 fused
grid steps of one kernel launch.

Semantics match ``sei_tpu.models.swinir.SwinBlock`` exactly (LN eps 1e-5 with
f32 statistics, torch-packed qkv with per-head split, relative-position bias
+ shifted-window mask added in f32 before an f32 softmax, exact GELU,
per-sample drop-path masks on both residual branches); golden-tested against
the unfused flax model in tests/test_swin_trunk.py.

Layout contract (stacked over the block axis D; C = embed dim, Ch = mlp
hidden, N = ws*ws, nh heads, nW windows):
  params: ln1_s, ln1_b: (D, C) f32;  qkv_w: (D, C, 3C); qkv_b: (D, 3C)
          proj_w: (D, C, C); proj_b: (D, C); ln2_s, ln2_b: (D, C)
          fc1_w: (D, C, Ch); fc1_b: (D, Ch); fc2_w: (D, Ch, C); fc2_b: (D, C)
  rpb:  (D, nh, N, N) f32   pre-expanded relative-position bias per block
  mask: (nW, N, N) f32      shifted-window mask (odd blocks); zeros when
                            min(H, W) <= ws (then no block shifts)
  dpm:  (D, B) f32          drop-path keep mask, pre-scaled (0 or 1/keep)

Forward grid: (B, D//2) - one image per outer step, one (no-shift, shift)
block PAIR per inner step (shift parity is static, no lax.cond); the image
activation lives in VMEM scratch across the pair steps, block inputs are
saved to HBM (``xs``) for the backward.  Backward grid: (B, D//2) with the
pair axis reversed; recomputes block internals chunk-by-chunk (remat style)
and emits PER-IMAGE weight grads (B, D, ...) that XLA sum-reduces - keeping
the kernel's VMEM footprint ~13 MB (v5e has ~16 MB/core).
"""

from __future__ import annotations

import functools
import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PARAM_LEAVES = (
    "ln1_s", "ln1_b", "qkv_w", "qkv_b", "proj_w", "proj_b",
    "ln2_s", "ln2_b", "fc1_w", "fc1_b", "fc2_w", "fc2_b",
)

_EPS = 1e-5
_SQRT_2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


class TrunkDims(NamedTuple):
    d: int      # blocks (even)
    b: int      # batch
    h: int
    w: int
    c: int
    nh: int     # heads
    ws: int     # window size
    ch: int     # mlp hidden
    shift: int  # ws//2, or 0 when min(h, w) <= ws (no shifted blocks)


def make_dims(x_shape, params, num_heads, window_size) -> TrunkDims:
    b, h, w, c = x_shape
    d = params["ln1_s"].shape[0]
    ch = params["fc1_w"].shape[-1]
    shift = window_size // 2 if min(h, w) > window_size else 0
    return TrunkDims(d=d, b=b, h=h, w=w, c=c, nh=num_heads, ws=window_size,
                     ch=ch, shift=shift)


# -- elementwise pieces ------------------------------------------------------


def _gelu_exact(x32):
    return 0.5 * x32 * (1.0 + jax.lax.erf(x32 / _SQRT_2))


def _gelu_grad(x32):
    return (0.5 * (1.0 + jax.lax.erf(x32 / _SQRT_2))
            + x32 * jnp.exp(-0.5 * x32 * x32) * _INV_SQRT_2PI)


def _ln_fwd(x32, scale, bias):
    """x32 (..., C) f32 -> (y32, xhat, inv_sigma)."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    xhat = xc * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd(dy32, xhat, inv, scale):
    """dx32 for LN; dscale/dbias are reduced by the caller."""
    g = dy32 * scale
    mean_g = jnp.mean(g, axis=-1, keepdims=True)
    mean_gx = jnp.mean(g * xhat, axis=-1, keepdims=True)
    return (g - mean_g - xhat * mean_gx) * inv


# -- layout pieces -----------------------------------------------------------


def _window_tokens(y, dims: TrunkDims):
    """(H, W, C) -> (nW, N, C), h-major window order (flax parity)."""
    ws = dims.ws
    nwh, nww = dims.h // ws, dims.w // ws
    t = y.reshape(nwh, ws, nww, ws, dims.c)
    t = t.transpose(0, 2, 1, 3, 4)
    return t.reshape(nwh * nww, ws * ws, dims.c)


def _unwindow_tokens(t, dims: TrunkDims):
    ws = dims.ws
    nwh, nww = dims.h // ws, dims.w // ws
    y = t.reshape(nwh, nww, ws, ws, dims.c)
    y = y.transpose(0, 2, 1, 3, 4)
    return y.reshape(dims.h, dims.w, dims.c)


def _split_heads(tok, dims: TrunkDims):
    """(nW', N, C) -> (nW'*nh, N, hd)."""
    nw, n, c = tok.shape
    hd = c // dims.nh
    x = tok.reshape(nw, n, dims.nh, hd).transpose(0, 2, 1, 3)
    return x.reshape(nw * dims.nh, n, hd)


def _merge_heads(x, dims: TrunkDims):
    """(nW'*nh, N, hd) -> (nW', N, C)."""
    nh = dims.nh
    nwnh, n, hd = x.shape
    nw = nwnh // nh
    x = x.reshape(nw, nh, n, hd).transpose(0, 2, 1, 3)
    return x.reshape(nw, n, nh * hd)


def _bdot(a, b, transpose_b=False):
    """Batched (B_, M, K) @ (B_, K, N) (or K-contraction with b transposed)
    in f32 accumulation."""
    dims = (((2,), (2 if transpose_b else 1,)), ((0,), (0,)))
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


def _dot(a, b, transpose_a=False, transpose_b=False):
    dims = (((0 if transpose_a else 1,), (1 if transpose_b else 0,)), ((), ()))
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


# -- one block, one image (chunked; shared by reference and kernels) ---------


def _chunk_size(n, target):
    """Largest divisor of n that is <= target (chunking granularity)."""
    for k in range(min(target, n), 0, -1):
        if n % k == 0:
            return k
    return n


def _attn_branch_fwd(x, pd, rpb_d, mask, dims: TrunkDims, shifted: bool,
                     wch: int = 12):
    """LN1 -> windows -> qkv -> MSA -> proj -> unwindow.  Returns (y, xhat1,
    inv1) with y in x.dtype; attention internals are chunked over windows."""
    cdt = x.dtype
    c = dims.c
    hd = c // dims.nh
    a32, xhat1, inv1 = _ln_fwd(x.astype(jnp.float32), pd["ln1_s"], pd["ln1_b"])
    a = a32.astype(cdt)
    if shifted:
        a = jnp.roll(a, (-dims.shift, -dims.shift), axis=(0, 1))
    tok = _window_tokens(a, dims)  # (nW, N, C)
    nw, n, _ = tok.shape
    csz = _chunk_size(nw, wch)
    outs = []
    for w0 in range(0, nw, csz):
        tchunk = tok[w0 : w0 + csz].reshape(csz * n, c)
        qkv = (_dot(tchunk, pd["qkv_w"].astype(cdt)) + pd["qkv_b"]).astype(cdt)
        qkv = qkv.reshape(csz, n, 3 * c)
        q = _split_heads(qkv[..., :c], dims)
        k = _split_heads(qkv[..., c : 2 * c], dims)
        v = _split_heads(qkv[..., 2 * c :], dims)
        s = _bdot(q, k, transpose_b=True) * (hd ** -0.5)  # f32
        s = s.reshape(csz, dims.nh, n, n) + rpb_d[None].astype(jnp.float32)
        if shifted:
            s = s + mask[w0 : w0 + csz, None].astype(jnp.float32)
        s = s.reshape(csz * dims.nh, n, n)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
        av = _bdot(p, v).astype(cdt)  # (csz*nh, N, hd)
        t = _merge_heads(av, dims).reshape(csz * n, c)
        o = (_dot(t, pd["proj_w"].astype(cdt)) + pd["proj_b"]).astype(cdt)
        outs.append(o.reshape(csz, n, c))
    y = _unwindow_tokens(jnp.concatenate(outs, axis=0), dims)
    if shifted:
        y = jnp.roll(y, (dims.shift, dims.shift), axis=(0, 1))
    return y, xhat1, inv1


def _mlp_branch_fwd(x2, pd, dims: TrunkDims, tch: int = 768):
    """LN2 -> fc1 -> gelu -> fc2, chunked over token rows."""
    cdt = x2.dtype
    c = dims.c
    flat32 = x2.astype(jnp.float32).reshape(dims.h * dims.w, c)
    nt = flat32.shape[0]
    csz = _chunk_size(nt, tch)
    outs = []
    for t0 in range(0, nt, csz):
        z32, _, _ = _ln_fwd(flat32[t0 : t0 + csz], pd["ln2_s"], pd["ln2_b"])
        h32 = _dot(z32.astype(cdt), pd["fc1_w"].astype(cdt)) + pd["fc1_b"]
        g = _gelu_exact(h32).astype(cdt)
        m = (_dot(g, pd["fc2_w"].astype(cdt)) + pd["fc2_b"]).astype(cdt)
        outs.append(m)
    return jnp.concatenate(outs, axis=0).reshape(dims.h, dims.w, c)


def _block_fwd_image(x, pd, rpb_d, mask, dpm_bd, dims: TrunkDims,
                     shifted: bool):
    """One SwinBlock on one image tile (H, W, C)."""
    y, _, _ = _attn_branch_fwd(x, pd, rpb_d, mask, dims, shifted)
    x2 = (x.astype(jnp.float32) + dpm_bd * y.astype(jnp.float32)).astype(x.dtype)
    m = _mlp_branch_fwd(x2, pd, dims)
    return (x2.astype(jnp.float32) + dpm_bd * m.astype(jnp.float32)).astype(x.dtype)


def _zero_grads(pd):
    return {k: jnp.zeros(v.shape, jnp.float32) for k, v in pd.items()}


def _block_bwd_image(dout, x, pd, rpb_d, mask, dpm_bd, dims: TrunkDims,
                     shifted: bool, wch: int = 12, tch: int = 768):
    """Backward of one block for one image; recomputes internals chunked.

    Returns (dx, grads dict (f32, unstacked), drpb_d (nh, N, N) f32).
    """
    cdt = x.dtype
    c = dims.c
    hd = c // dims.nh
    gr = _zero_grads(pd)

    # recompute x2 (attention fwd, internals discarded)
    y_attn, xhat1, inv1 = _attn_branch_fwd(x, pd, rpb_d, mask, dims, shifted)
    x2 = (x.astype(jnp.float32)
          + dpm_bd * y_attn.astype(jnp.float32)).astype(cdt)

    do32 = dout.astype(jnp.float32)

    # ---- MLP branch backward (chunked over tokens) -------------------------
    x2flat32 = x2.astype(jnp.float32).reshape(dims.h * dims.w, c)
    dmflat = (dpm_bd * do32).reshape(dims.h * dims.w, c)
    nt = x2flat32.shape[0]
    csz = _chunk_size(nt, tch)
    dx2_parts = []
    for t0 in range(0, nt, csz):
        x2c = x2flat32[t0 : t0 + csz]
        z32, xhat2, inv2 = _ln_fwd(x2c, pd["ln2_s"], pd["ln2_b"])
        zc = z32.astype(cdt)
        h32 = _dot(zc, pd["fc1_w"].astype(cdt)) + pd["fc1_b"]
        g = _gelu_exact(h32).astype(cdt)
        dm = dmflat[t0 : t0 + csz]
        gr["fc2_w"] += _dot(g, dm.astype(cdt), transpose_a=True)
        gr["fc2_b"] += jnp.sum(dm, axis=0)
        dg = _dot(dm.astype(cdt), pd["fc2_w"].astype(cdt), transpose_b=True)
        dh = dg * _gelu_grad(h32)
        gr["fc1_w"] += _dot(zc, dh.astype(cdt), transpose_a=True)
        gr["fc1_b"] += jnp.sum(dh, axis=0)
        dz = _dot(dh.astype(cdt), pd["fc1_w"].astype(cdt), transpose_b=True)
        gr["ln2_s"] += jnp.sum(dz * xhat2, axis=0)
        gr["ln2_b"] += jnp.sum(dz, axis=0)
        dx2_parts.append(_ln_bwd(dz, xhat2, inv2, pd["ln2_s"]))
    dx2 = do32 + jnp.concatenate(dx2_parts, axis=0).reshape(
        dims.h, dims.w, c)

    # ---- attention branch backward (chunked over windows) ------------------
    dy = (dpm_bd * dx2).astype(cdt)
    if shifted:
        dy = jnp.roll(dy, (-dims.shift, -dims.shift), axis=(0, 1))
    do_tok = _window_tokens(dy, dims)  # (nW, N, C)

    # recompute LN1 output tokens (shared by all chunks)
    a32 = xhat1 * pd["ln1_s"] + pd["ln1_b"]
    a = a32.astype(cdt)
    if shifted:
        a = jnp.roll(a, (-dims.shift, -dims.shift), axis=(0, 1))
    a_tok = _window_tokens(a, dims)

    nw, n, _ = a_tok.shape
    wcs = _chunk_size(nw, wch)
    da_parts = []
    drpb = jnp.zeros((dims.nh, n, n), jnp.float32)
    for w0 in range(0, nw, wcs):
        ac = a_tok[w0 : w0 + wcs].reshape(wcs * n, c)
        qkv = (_dot(ac, pd["qkv_w"].astype(cdt)) + pd["qkv_b"]).astype(cdt)
        qkv = qkv.reshape(wcs, n, 3 * c)
        q = _split_heads(qkv[..., :c], dims)
        k = _split_heads(qkv[..., c : 2 * c], dims)
        v = _split_heads(qkv[..., 2 * c :], dims)
        s = _bdot(q, k, transpose_b=True) * (hd ** -0.5)
        s = s.reshape(wcs, dims.nh, n, n) + rpb_d[None].astype(jnp.float32)
        if shifted:
            s = s + mask[w0 : w0 + wcs, None].astype(jnp.float32)
        s = s.reshape(wcs * dims.nh, n, n)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # f32
        pc = p.astype(cdt)
        av = _bdot(pc, v).astype(cdt)
        t = _merge_heads(av, dims).reshape(wcs * n, c)

        doc = do_tok[w0 : w0 + wcs].reshape(wcs * n, c)
        gr["proj_w"] += _dot(t, doc.astype(cdt), transpose_a=True)
        gr["proj_b"] += jnp.sum(doc.astype(jnp.float32), axis=0)
        dt = _dot(doc.astype(cdt), pd["proj_w"].astype(cdt), transpose_b=True)
        dav = _split_heads(dt.astype(cdt).reshape(wcs, n, c), dims)
        dp = _bdot(dav, v, transpose_b=True)  # f32 (wcs*nh, N, N)
        dv = _bdot(pc.transpose(0, 2, 1), dav)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        drpb += jnp.sum(ds.reshape(wcs, dims.nh, n, n), axis=0)
        dsc = ds.astype(cdt)
        dq = _bdot(dsc, k) * (hd ** -0.5)
        dk = _bdot(dsc.transpose(0, 2, 1), q) * (hd ** -0.5)
        dqkv = jnp.concatenate(
            [_merge_heads(dq.astype(cdt), dims),
             _merge_heads(dk.astype(cdt), dims),
             _merge_heads(dv.astype(cdt), dims)],
            axis=-1,
        ).reshape(wcs * n, 3 * c)
        gr["qkv_w"] += _dot(ac, dqkv, transpose_a=True)
        gr["qkv_b"] += jnp.sum(dqkv.astype(jnp.float32), axis=0)
        da_parts.append(_dot(dqkv, pd["qkv_w"].astype(cdt), transpose_b=True)
                        .astype(cdt).reshape(wcs, n, c))

    da = _unwindow_tokens(jnp.concatenate(da_parts, axis=0), dims)
    if shifted:
        da = jnp.roll(da, (dims.shift, dims.shift), axis=(0, 1))
    da32 = da.astype(jnp.float32)
    gr["ln1_s"] += jnp.sum(da32 * xhat1, axis=(0, 1))
    gr["ln1_b"] += jnp.sum(da32, axis=(0, 1))
    dx = dx2 + _ln_bwd(da32, xhat1, inv1, pd["ln1_s"])
    return dx.astype(cdt), gr, drpb


def _slice_pd(params, d):
    return {k: v[d] for k, v in params.items()}


# ---------------------------------------------------------------------------
# Pure-JAX reference (and non-TPU fallback)
# ---------------------------------------------------------------------------


def trunk_reference(x, params, rpb, mask, dpm, *, num_heads, window_size):
    """Batched trunk forward via the same per-image block function."""
    dims = make_dims(x.shape, params, num_heads, window_size)
    mask_arr = _mask_array(mask, dims)

    def per_image(xi, dpm_i):
        for d in range(dims.d):
            shifted = (d % 2 == 1) and dims.shift > 0
            xi = _block_fwd_image(xi, _slice_pd(params, d), rpb[d], mask_arr,
                                  dpm_i[d], dims, shifted)
        return xi

    return jax.vmap(per_image, in_axes=(0, 1))(x, dpm)


def _mask_array(mask, dims: TrunkDims):
    n = dims.ws * dims.ws
    nw = (dims.h // dims.ws) * (dims.w // dims.ws)
    if mask is None:
        return jnp.zeros((nw, n, n), jnp.float32)
    return jnp.asarray(mask, jnp.float32)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------
#
# Mosaic requires the last two dims of every block shape to be divisible by
# (8, 128) or equal to the full array dims.  Stacked leaves are therefore
# reshaped (D, ...) -> (P, 2, ...) so the per-pair block (1, 2, ...) always
# ends in full dimensions; the drop-path mask rides in SMEM (scalar reads
# with dynamic indices).

_W_ORDER = PARAM_LEAVES  # ref order for positional plumbing


def _pairize(arr):
    """(D, ...) -> (D//2, 2, ...)."""
    return arr.reshape((arr.shape[0] // 2, 2) + arr.shape[1:])


def _fwd_kernel(dims: TrunkDims,
                x_ref, *rest):
    refs = list(rest)
    w_refs = {k: refs.pop(0) for k in _W_ORDER}
    rpb_ref, mask_ref, dpm_ref, y_ref, xs_ref, x_scr = refs
    ib = pl.program_id(0)
    ip = pl.program_id(1)  # pair index
    npairs = dims.d // 2

    @pl.when(ip == 0)
    def _():
        x_scr[...] = x_ref[0]

    mask = mask_ref[...]
    x = x_scr[...]
    for j in range(2):  # (no-shift, shift) pair
        xs_ref[j, 0] = x
        pd = {k: w_refs[k][0, j] for k in _W_ORDER}
        shifted = (j == 1) and dims.shift > 0
        dpm_bd = dpm_ref[2 * ip + j, ib]
        x = _block_fwd_image(x, pd, rpb_ref[0, j], mask, dpm_bd,
                             dims, shifted)
    x_scr[...] = x

    @pl.when(ip == npairs - 1)
    def _():
        y_ref[0] = x


def _bwd_kernel(dims: TrunkDims,
                dy_ref, *rest):
    refs = list(rest)
    w_refs = {k: refs.pop(0) for k in _W_ORDER}
    rpb_ref, mask_ref, dpm_ref, xs_ref, dx_ref, drpb_ref = refs[:6]
    dw_refs = {k: r for k, r in zip(_W_ORDER, refs[6:18])}
    dx_scr = refs[18]
    ib = pl.program_id(0)
    ip = pl.program_id(1)  # pair axis walked in reverse via the index maps
    npairs = dims.d // 2
    pair = npairs - 1 - ip  # actual pair index (for the SMEM dpm lookup)

    @pl.when(ip == 0)
    def _():
        dx_scr[...] = dy_ref[0]

    mask = mask_ref[...]
    dx = dx_scr[...]
    for j in (1, 0):  # reverse within the pair
        x_in = xs_ref[j, 0]
        pd = {k: w_refs[k][0, j] for k in _W_ORDER}
        shifted = (j == 1) and dims.shift > 0
        dpm_bd = dpm_ref[2 * pair + j, ib]
        dx, gr, drpb_d = _block_bwd_image(
            dx, x_in, pd, rpb_ref[0, j], mask, dpm_bd, dims, shifted)
        for k in _W_ORDER:
            dw_refs[k][0, 0, j] = gr[k].astype(dw_refs[k].dtype)
        drpb_ref[0, 0, j] = drpb_d
    dx_scr[...] = dx

    @pl.when(ip == npairs - 1)
    def _():
        dx_ref[0] = dx


def _pair_spec(shp_pairized, index_map):
    """BlockSpec for one (1, 2, ...) pair block of a pairized array."""
    nd = len(shp_pairized) - 2
    return pl.BlockSpec((1, 2) + shp_pairized[2:],
                        (lambda im: (lambda ib, ip: im(ib, ip) + (0,) * nd))(index_map),
                        memory_space=pltpu.VMEM)


def _fwd_pallas(x, params, rpb, mask, dpm, dims: TrunkDims, interpret=False):
    npairs = dims.d // 2
    n = dims.ws * dims.ws
    nw = (dims.h // dims.ws) * (dims.w // dims.ws)
    pparams = {k: _pairize(params[k]) for k in _W_ORDER}
    prpb = _pairize(rpb)
    fwd_im = lambda ib, ip: (ip, 0)
    in_specs = [
        pl.BlockSpec((1, dims.h, dims.w, dims.c), lambda ib, ip: (ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        *[_pair_spec(pparams[k].shape, fwd_im) for k in _W_ORDER],
        _pair_spec(prpb.shape, fwd_im),
        pl.BlockSpec((nw, n, n), lambda ib, ip: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # dpm (D, B), dynamic reads
    ]
    out_specs = (
        pl.BlockSpec((1, dims.h, dims.w, dims.c), lambda ib, ip: (ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 1, dims.h, dims.w, dims.c),
                     lambda ib, ip: (ip, ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    out_shapes = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct((dims.d, dims.b, dims.h, dims.w, dims.c), x.dtype),
    )
    mask_arr = _mask_array(mask, dims)
    y, xs = pl.pallas_call(
        functools.partial(_fwd_kernel, dims),
        grid=(dims.b, npairs),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((dims.h, dims.w, dims.c), x.dtype)],
        interpret=interpret,
    )(x, *[pparams[k] for k in _W_ORDER], prpb, mask_arr, dpm)
    return y, xs


def _bwd_pallas(params, rpb, mask, dpm, xs, dy, dims: TrunkDims,
                interpret=False):
    npairs = dims.d // 2
    n = dims.ws * dims.ws
    nw = (dims.h // dims.ws) * (dims.w // dims.ws)
    pparams = {k: _pairize(params[k]) for k in _W_ORDER}
    prpb = _pairize(rpb)
    rev_im = lambda ib, ip: (npairs - 1 - ip, 0)
    in_specs = [
        pl.BlockSpec((1, dims.h, dims.w, dims.c), lambda ib, ip: (ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        *[_pair_spec(pparams[k].shape, rev_im) for k in _W_ORDER],
        _pair_spec(prpb.shape, rev_im),
        pl.BlockSpec((nw, n, n), lambda ib, ip: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # dpm
        pl.BlockSpec((2, 1, dims.h, dims.w, dims.c),
                     lambda ib, ip: (npairs - 1 - ip, ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # outputs: dx (B,...); PER-IMAGE drpb and weight grads (B, P, 2, ...)
    # that XLA sum-reduces over images afterwards (keeps VMEM small).
    out_specs = [
        pl.BlockSpec((1, dims.h, dims.w, dims.c), lambda ib, ip: (ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 2, dims.nh, n, n),
                     lambda ib, ip: (ib, npairs - 1 - ip, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((dims.b, dims.h, dims.w, dims.c), dy.dtype),
        jax.ShapeDtypeStruct((dims.b, npairs, 2, dims.nh, n, n), jnp.float32),
    ]
    for k in _W_ORDER:
        pshp = pparams[k].shape  # (P, 2, ...)
        nd = len(pshp) - 2
        out_specs.append(pl.BlockSpec(
            (1, 1, 2) + pshp[2:],
            (lambda m: (lambda ib, ip: (ib, npairs - 1 - ip, 0) + (0,) * m))(nd),
            memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(
            (dims.b,) + pshp, jnp.float32))

    mask_arr = _mask_array(mask, dims)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, dims),
        grid=(dims.b, npairs),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[pltpu.VMEM((dims.h, dims.w, dims.c), dy.dtype)],
        interpret=interpret,
    )(dy, *[pparams[k] for k in _W_ORDER], prpb, mask_arr, dpm, xs)
    dx = outs[0]
    drpb = jnp.sum(outs[1], axis=0).reshape((dims.d, dims.nh, n, n))
    dparams = {
        k: jnp.sum(o, axis=0).reshape(params[k].shape)
        for k, o in zip(_W_ORDER, outs[2:])
    }
    return dx, dparams, drpb


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 5, 6, 7))
def _trunk_pallas(x, params, rpb, mask, dpm, num_heads, window_size,
                  interpret):
    dims = make_dims(x.shape, params, num_heads, window_size)
    y, _ = _fwd_pallas(x, params, rpb, mask, dpm, dims, interpret=interpret)
    return y


def _trunk_fwd(x, params, rpb, mask, dpm, num_heads, window_size, interpret):
    dims = make_dims(x.shape, params, num_heads, window_size)
    y, xs = _fwd_pallas(x, params, rpb, mask, dpm, dims, interpret=interpret)
    return y, (x.shape, params, rpb, dpm, xs)


def _trunk_bwd(mask, num_heads, window_size, interpret, res, dy):
    x_shape, params, rpb, dpm, xs = res
    dims = make_dims(x_shape, params, num_heads, window_size)
    dx, dparams, drpb = _bwd_pallas(params, rpb, mask, dpm, xs, dy, dims,
                                    interpret=interpret)
    return dx, dparams, drpb.astype(rpb.dtype), jnp.zeros_like(dpm)


_trunk_pallas.defvjp(_trunk_fwd, _trunk_bwd)


def swin_trunk(
    x: jnp.ndarray,
    params: dict,
    rpb: jnp.ndarray,
    mask: Optional[np.ndarray],
    dpm: jnp.ndarray,
    *,
    num_heads: int,
    window_size: int,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """D SwinBlocks on (B, H, W, C); see module docstring for layouts.

    ``mask`` must be a trace-time numpy constant (it rides in custom_vjp
    nondiff_argnums).  Falls back to the pure-JAX reference off-TPU.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    if not use_pallas and not interpret:
        return trunk_reference(x, params, rpb, mask, dpm,
                               num_heads=num_heads, window_size=window_size)
    if mask is not None:
        assert isinstance(mask, np.ndarray), "mask must be a numpy constant"
        mask = np.ascontiguousarray(mask, dtype=np.float32)
    return _trunk_pallas(x, params, rpb.astype(jnp.float32), mask, dpm,
                         num_heads, window_size, interpret)
