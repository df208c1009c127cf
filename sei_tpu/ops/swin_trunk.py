"""Fused Swin trunk: D successive SwinBlocks as ONE Pallas TPU kernel.

Why: the flagship SwinIR (ref src/models/__init__.py:51-74) runs 36 small
attention blocks per forward; XLA lowers each to ~20 kernels on 48px crops,
so the train step is per-op-overhead/bandwidth bound at ~8% MFU (round-2
probes: fwd b8 = 19ms vs a ~2.3ms bf16 roofline).  This kernel computes all
``D`` blocks of one RSTB for a GROUP of ``G`` images entirely in VMEM:
activations never round-trip to HBM between blocks, and ~20*D XLA ops
collapse into (B/G)*(D/2) fused grid steps of one kernel launch.

Semantics match ``sei_tpu.models.swinir.SwinBlock`` exactly (LN eps 1e-5 with
f32 statistics, torch-packed qkv with per-head split, relative-position bias
+ shifted-window mask added in f32 before an f32 softmax, exact GELU,
per-sample drop-path masks drawn INDEPENDENTLY for the attention and MLP
residual branches - the reference's DropPath-per-call semantics);
golden-tested against the unfused flax model in tests/test_swin_trunk.py.

Layout contract (stacked over the block axis D; C = embed dim, Ch = mlp
hidden, N = ws*ws, nh heads, nW windows per image):
  params: ln1_s, ln1_b: (D, C) f32;  qkv_w: (D, C, 3C); qkv_b: (D, 3C)
          proj_w: (D, C, C); proj_b: (D, C); ln2_s, ln2_b: (D, C)
          fc1_w: (D, C, Ch); fc1_b: (D, Ch); fc2_w: (D, Ch, C); fc2_b: (D, C)
  rpb:  (D, nh, N, N) f32   pre-expanded relative-position bias per block
  mask: (nW, N, N) f32      shifted-window mask (odd blocks); zeros when
                            min(H, W) <= ws (then no block shifts)
  dpm:  (D, 2, B) f32       drop-path keep masks, pre-scaled (0 or 1/keep);
                            axis 1 = (attention branch, MLP branch)

Forward grid: (B//G, D//2) - one image GROUP per outer step, one (no-shift,
shift) block PAIR per inner step (shift parity is static, no lax.cond); the
group's activations live in VMEM scratch across the pair steps.  The
forward has three modes: "full" (bf16 training) saves block inputs xs,
mid-block residuals xs2, gelu(h), gelu'(h), softmax probs p and the
attention output tfull to HBM so the backward does NO transcendental or
attention recompute (the r3u probes showed the recompute backward was
~half VPU-bound on f32 erf/softmax chains); "xs" (f32 training) saves only
xs/xs2 and recomputes the rest bit-exactly (the f32 save blocks overflow
the Mosaic VMEM allocator); "none" (eval primal) saves nothing.  Backward
grid: (B//G, D//2) with the pair axis reversed; emits PER-GROUP weight
grads (B//G, D, ...) that XLA sum-reduces.

Attention layout (the round-3 restructure): Mosaic cannot reshape-split the
LANE dim (C -> nh x hd), and per-head batched matmuls (M=N=64) use <20% of
the 128x128 MXU.  Attention therefore runs TRANSPOSE-FREE via head masks
with the head axis FOLDED INTO THE ROW DIM, packed PER LANE TILE (see the
"head/tile packing" section): a trace-time 0/1 permutation packs as many
heads as fit into each 128-lane tile (flagship C=180/nh=6/hd=30 -> tiles
of 4+2 heads), and per tile qm = (q .* m_h) stacks as (csz, ht*N, 128) so
scores = qm @ k_t^T is one batched matmul with M = ht*N rows (the 0/1 mask
m_h zeroes the other heads' channels, so the 128-lane contraction equals
the per-head one); att = p @ v_t lands the tile's context in
(csz, ht*N, 128), merged by a masked sum over h.  Nominal inflation vs an
hd-lane contraction is 128/hd (~4.3x for the flagship) — but the MXU pads
any K<=128 contraction to one full 128-lane pass, so the per-head-"exact"
variant issues the SAME row-streams with smaller M per matmul and a WIDER
packed layout (c2 = n_tiles*128 grows the qkv/proj projections).  Measured
on chip (SEI_TRUNK_HPT probe, r5, perf_probe_r5a.log, 2 reps): greedy
packing 105.36 img/s; 2-heads-per-tile (c2=384) 87.71 (-17%); exact
per-head (c2=768) does not even compile — the backward kernel exceeds the
VMEM scoped-allocation limit by 1.57 MB (117.96M vs 116.39M).  The nominal
"FLOP inflation" is therefore pure accounting, not recoverable time: the
greedy packed layout is the measured optimum and the MXU-granularity
ceiling statement is complete.  The
backward contracts the ht*N row dim directly for dv/dk - the head masks
ride inside p/qm, so those grads need no per-head handling at all.
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
    g: int      # images per grid step (divides b)
    h: int
    w: int
    c: int
    nh: int     # heads
    ws: int     # window size
    ch: int     # mlp hidden
    shift: int  # ws//2, or 0 when min(h, w) <= ws (no shifted blocks)


def _pick_group(b: int, h: int, w: int, c: int, itemsize: int,
                budget_mb: int, env_name: str) -> int:
    """Largest divisor of b whose VMEM working set stays under budget.

    Per-group bytes ~ 8 activation-sized buffers (x_scr, wa/wb/wc, f1-f3,
    xs block) in mixed cdt/f32; the budget leaves room for weights, chunk
    transients, double-buffered IO windows and the compiler's temporaries
    inside the 128 MB physical VMEM.  The backward kernel carries ~2x the
    scratch of the forward (3 f32 row buffers + 3 token buffers), so it
    gets a smaller budget.  Overridable via SEI_TRUNK_G / SEI_TRUNK_G_BWD.

    VMEM buffers are (8, 128)-tiled, so the LANE-PADDED channel count is
    what actually occupies memory: a c=16 trunk costs as much per lane-tile
    as c=128 (measured: a c=16/f32 config sized with raw c picked g=8 and
    asked Mosaic for 123 MB).  The budgets are calibrated against padded
    sizes so the flagship (c=180 -> 256 lanes) picks the measured-optimal
    groups: bf16+saves g=1, bf16 save-free fwd g=2 / bwd g=1, f32 g=1.
    """
    env = _env_int(env_name, 0)
    # cdt + f32 activation buffers, plus the fwd-saved residual blocks
    # resident per grid step: gelu/gelu' (2 x ch ~= 2c), softmax probs
    # (nh*N*N per window ~= 2c rows) and tfull (~1.4c)
    c_pad = -(-c // 128) * 128
    per_image = h * w * c_pad * (12 * itemsize + 4 * 4)
    g = 1
    for cand in range(1, b + 1):
        if b % cand == 0 and cand * per_image <= budget_mb * 1024 * 1024:
            g = cand
    if env:
        g = env if b % env == 0 else g
    return g


def make_dims(x_shape, params, num_heads, window_size, g: int = 0) -> TrunkDims:
    b, h, w, c = x_shape
    d = params["ln1_s"].shape[0]
    ch = params["fc1_w"].shape[-1]
    shift = window_size // 2 if min(h, w) > window_size else 0
    if g <= 0:
        g = 1
    return TrunkDims(d=d, b=b, g=g, h=h, w=w, c=c, nh=num_heads,
                     ws=window_size, ch=ch, shift=shift)


# -- elementwise pieces ------------------------------------------------------


def _erf(x):
    """Abramowitz-Stegun 7.1.26 polynomial erf (|err| <= 1.5e-7).

    Mosaic has no erf primitive; this matches torch/flax exact-GELU well
    inside the f32 golden tolerance (1.5e-7 << 2e-5).
    """
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(x32):
    return 0.5 * x32 * (1.0 + _erf(x32 / _SQRT_2))


def _gelu_grad(x32):
    return (0.5 * (1.0 + _erf(x32 / _SQRT_2))
            + x32 * jnp.exp(-0.5 * x32 * x32) * _INV_SQRT_2PI)


def _gelu_pair(x32):
    """(gelu(x), gelu'(x)) sharing one erf evaluation.

    The forward saves both (in the compute dtype) so the backward never
    re-runs the erf polynomial chains - the r3u probe decomposition showed
    the MLP backward is VPU-bound on exactly those chains (~5 of its 7 ms
    per 6-RSTB chain at b8/48px bf16).
    """
    cdf = 0.5 * (1.0 + _erf(x32 / _SQRT_2))
    pdf = jnp.exp(-0.5 * x32 * x32) * _INV_SQRT_2PI
    return x32 * cdf, cdf + x32 * pdf


# Chebyshev-fitted odd polynomials on [-4, 4] (exact-saturation tails):
# Phi(x) = 0.5 + x*Q1(x^2), x*pdf(x) = x*Q2(x^2).  Full-f32-range max errors
# |gelu| <= 1.3e-4, |gelu'| <= 5.1e-4 - an order below bf16 resolution
# (2^-8 ~ 3.9e-3 rel), at ~3x fewer VPU ops than the erf chain (no divide,
# no exp).  Used only when the compute dtype is bf16 (SEI_FAST_GELU
# overrides); f32 keeps the exact A&S erf.
_GELU_XC = 4.0
_C_PHI = (0.3989390292359633, -0.06647417597398475, 0.009949619744973907,
          -0.0011709367759583488, 0.00010915483414148812,
          -7.956239157270749e-06, 4.340088563312956e-07,
          -1.6419572555948384e-08, 3.7875219898373147e-10,
          -3.969025307598051e-12)
_C_XPDF = (0.3988928463183661, -0.19922337402921744, 0.04949916878279405,
           -0.008056541327475311, 0.0009400990867306437,
           -8.006941709520028e-05, 4.854256860196168e-06,
           -1.9705490399271182e-07, 4.764393641533242e-09,
           -5.154521748137964e-11)


def _horner(coefs, u):
    acc = jnp.full_like(u, coefs[-1])
    for c in coefs[-2::-1]:
        acc = acc * u + c
    return acc


def _gelu_fast(x32):
    xc = jnp.clip(x32, -_GELU_XC, _GELU_XC)
    u = xc * xc
    phi = 0.5 + xc * _horner(_C_PHI, u)
    phi = jnp.where(x32 > _GELU_XC, 1.0,
                    jnp.where(x32 < -_GELU_XC, 0.0, phi))
    return x32 * phi


def _gelu_pair_fast(x32):
    xc = jnp.clip(x32, -_GELU_XC, _GELU_XC)
    u = xc * xc
    inr = jnp.abs(x32) <= _GELU_XC
    phi = jnp.where(inr, 0.5 + xc * _horner(_C_PHI, u),
                    jnp.where(x32 > 0, 1.0, 0.0))
    xpdf = jnp.where(inr, xc * _horner(_C_XPDF, u), 0.0)
    return x32 * phi, phi + xpdf


def _use_fast_gelu(cdt):
    import os

    env = os.environ.get("SEI_FAST_GELU")
    if env is not None:
        return env not in ("0", "false", "")
    return cdt == jnp.bfloat16


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
    """(G, H, W, C) -> (G*nW, N, C), h-major window order (flax parity)."""
    ws = dims.ws
    g = y.shape[0]
    nwh, nww = dims.h // ws, dims.w // ws
    t = y.reshape(g, nwh, ws, nww, ws, dims.c)
    t = t.transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(g * nwh * nww, ws * ws, dims.c)


def _unwindow_tokens(t, g: int, dims: TrunkDims):
    ws = dims.ws
    nwh, nww = dims.h // ws, dims.w // ws
    y = t.reshape(g, nwh, nww, ws, ws, dims.c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(g, dims.h, dims.w, dims.c)


# -- head/tile packing --------------------------------------------------------
#
# Heads are packed LANE-TILE-ALIGNED: a trace-time 0/1 permutation matrix
# rearranges the qkv output columns (and proj input rows) so that no head's
# hd channels cross a 128-lane boundary.  Attention then runs PER TILE:
# each tile's masked-head matmuls contract 128 lanes instead of the full
# padded C (256 for the flagship's C=180) - halving the effective MXU work
# of every score-class matmul.  The packing matrices are exact (0/1), so
# autodiff maps the packed-layout gradients back to the raw parameters.

_TL = 128  # lane-tile width


def _head_tiling(nh: int, hd: int) -> list:
    """Greedy head->tile assignment: [(first_head, n_heads), ...].

    SEI_TRUNK_HPT caps heads per tile (probe knob, trace-time): 1 = the
    "exact per-head" attention variant (each head's hd channels alone in a
    128-lane tile, K still padded to 128 by the MXU), 2/3 = intermediate
    packings.  Default 0 = pack as many heads per tile as fit (the
    production layout; fewest tiles = fewest row-streams and smallest
    qkv/proj projection matmuls).
    """
    hpt = _env_int("SEI_TRUNK_HPT", 0) or nh
    tiles = []
    start, used, cnt = 0, 0, 0
    for h in range(nh):
        if used + hd > _TL or cnt == hpt:
            tiles.append((start, h - start))
            start, used, cnt = h, 0, 0
        used += hd
        cnt += 1
    tiles.append((start, nh - start))
    return tiles


def _pack_perm(nh: int, hd: int) -> np.ndarray:
    """(nh*hd, n_tiles*_TL) 0/1 matrix: raw channel -> tile-aligned slot."""
    tiles = _head_tiling(nh, hd)
    c2 = len(tiles) * _TL
    p = np.zeros((nh * hd, c2), np.float32)
    for t, (s, cnt) in enumerate(tiles):
        for h in range(s, s + cnt):
            for i in range(hd):
                p[h * hd + i, t * _TL + (h - s) * hd + i] = 1.0
    return p


def pack_attn_params(params: dict, nh: int) -> dict:
    """Repack stacked qkv_w/qkv_b/proj_w into the tile-aligned layout.

    qkv_w: (D, C, 3C) -> (D, C, 3*C2); qkv_b: (D, 3C) -> (D, 3*C2);
    proj_w: (D, C, C) -> (D, C2, C).  Exact 0/1 matmuls; other leaves pass
    through.  C2 = n_tiles * 128.
    """
    c = params["proj_w"].shape[-1]
    hd = c // nh
    p1 = jnp.asarray(_pack_perm(nh, hd))  # (C, C2)
    c2 = p1.shape[1]
    z = jnp.zeros_like(p1)
    p3 = jnp.concatenate([
        jnp.concatenate([p1, z, z], axis=1),
        jnp.concatenate([z, p1, z], axis=1),
        jnp.concatenate([z, z, p1], axis=1),
    ], axis=0)  # (3C, 3C2)
    out = dict(params)
    out["qkv_w"] = jnp.einsum("dcx,xy->dcy", params["qkv_w"], p3)
    out["qkv_b"] = jnp.einsum("dx,xy->dy", params["qkv_b"], p3)
    out["proj_w"] = jnp.einsum("xy,dxc->dyc", p1, params["proj_w"])
    return out


def _tile_head_mask(ht: int, hd: int) -> jnp.ndarray:
    """(ht, _TL) 0/1 mask for one tile; iota-built (no captured constants)."""
    li = jax.lax.broadcasted_iota(jnp.int32, (ht, _TL), 1)
    hi = jax.lax.broadcasted_iota(jnp.int32, (ht, _TL), 0)
    return ((li // hd == hi) & (li < ht * hd)).astype(jnp.float32)


def _bdot(a, b, transpose_b=False):
    """Batched (B_, M, K) @ (B_, K, N) (or K-contraction with b transposed)
    in f32 accumulation."""
    dims = (((2,), (2 if transpose_b else 1,)), ((0,), (0,)))
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


def _bdot_rows(a, b):
    """Contract the ROW (dim-1) axes: (B_, R, M) x (B_, R, N) -> (B_, M, N)
    in f32 accumulation (used for dv/dk where R = nh*N)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


def _dot(a, b, transpose_a=False, transpose_b=False):
    dims = (((0 if transpose_a else 1,), (1 if transpose_b else 0,)), ((), ()))
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


# -- one block, one image group (chunked; shared by reference and kernels) ---


def _chunk_size(n, target):
    """Largest divisor of n that is <= target (chunking granularity)."""
    for k in range(min(target, n), 0, -1):
        if n % k == 0:
            return k
    return n


def _env_int(name, default):
    import os

    v = os.environ.get(name)
    return int(v) if v else default


def _prof_skip_set():
    """Profiling-only branch skips (SEI_TRUNK_PROF_SKIP="attn,mlp,fattn,
    fmlp"): zero out whole kernel branches at trace time to decompose kernel
    cost.  Produces WRONG outputs/grads; never set outside perf probes."""
    import os

    return set(filter(None, os.environ.get(
        "SEI_TRUNK_PROF_SKIP", "").split(",")))


def _attn_branch_fwd(x, pd, rpb_d, mask, dims: TrunkDims, shifted: bool,
                     wch: int = None, scratch=None, save_attn=None):
    """LN1 -> windows -> qkv -> MSA -> proj -> unwindow.

    ``x``: (G, H, W, C).  Returns (y, xhat1, inv1) with y in x.dtype.
    Attention runs chunked over window groups inside a lax.fori_loop
    (bounded VMEM transients AND bounded Mosaic code size); the chunk size
    divides nW so a chunk never spans two images' mask tables.
    ``scratch``: dict of pallas VMEM scratch refs ("wa", "wb" of shape
    (G*nW, N, C)) - Mosaic cannot dynamic-slice VALUES, but refs take
    dynamic pl.ds indices, so the kernel path stages chunks through
    scratch; the pure-JAX path (scratch=None) uses plain lax.dynamic_slice.
    ``mask`` is a ref in the scratch path.
    """
    if wch is None:
        wch = _env_int("SEI_TRUNK_WCH", 12)
    cdt = x.dtype
    g = x.shape[0]
    c = dims.c
    hd = c // dims.nh
    nwi = (dims.h // dims.ws) * (dims.w // dims.ws)  # windows per image
    a32, xhat1, inv1 = _ln_fwd(x.astype(jnp.float32), pd["ln1_s"], pd["ln1_b"])
    a = a32.astype(cdt)
    if shifted:
        a = jnp.roll(a, (-dims.shift, -dims.shift), axis=(1, 2))
    tok = _window_tokens(a, dims)  # (G*nW, N, C)
    nw, n, _ = tok.shape
    csz = _chunk_size(nwi, wch)
    qkv_w = pd["qkv_w"].astype(cdt)   # (C, 3*C2), tile-packed
    proj_w = pd["proj_w"].astype(cdt)  # (C2, C)
    rpb32 = rpb_d.astype(jnp.float32)
    if scratch is not None:
        scratch["wa"][...] = tok

    tiles = _head_tiling(dims.nh, hd)
    c2 = len(tiles) * _TL
    scale = hd ** -0.5

    def attend(tchunk, mchunk):
        flat = tchunk.reshape(csz * n, c)
        qkv = (_dot(flat, qkv_w) + pd["qkv_b"]).astype(cdt)
        q = qkv[:, :c2].reshape(csz, n, c2)
        k = qkv[:, c2 : 2 * c2].reshape(csz, n, c2)
        v = qkv[:, 2 * c2 :].reshape(csz, n, c2)
        tparts, pparts = [], []
        for t2, (h0, ht) in enumerate(tiles):
            sl = slice(t2 * _TL, (t2 + 1) * _TL)
            q_t, k_t, v_t = q[..., sl], k[..., sl], v[..., sl]
            hm = _tile_head_mask(ht, hd)
            qm = (q_t[:, None] * hm[None, :, None, :].astype(cdt)).reshape(
                csz, ht * n, _TL)
            s = _bdot(qm, k_t, transpose_b=True) * scale  # (csz, ht*N, N) f32
            s = s.reshape(csz, ht, n, n) + rpb32[h0 : h0 + ht][None]
            if shifted:
                # slice+None indexing lowers to an unsupported Mosaic gather
                s = s + mchunk.reshape(csz, 1, n, n).astype(jnp.float32)
            s = s.reshape(csz, ht * n, n)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
            pparts.append(p)
            att = _bdot(p, v_t)  # (csz, ht*N, TL) f32
            tparts.append(jnp.sum(
                att.reshape(csz, ht, n, _TL) * hm[None, :, None, :],
                axis=1).astype(cdt))
        tfull = jnp.concatenate(tparts, axis=-1)  # (csz, N, C2)
        o = (_dot(tfull.reshape(csz * n, c2), proj_w) + pd["proj_b"]).astype(cdt)
        # p_all: per-window rows of all tiles stacked -> (csz, nh*N, N)
        p_all = jnp.concatenate(pparts, axis=1)
        return o.reshape(csz, n, c), p_all, tfull

    if scratch is not None:
        nhn = dims.nh * n

        def chunk(i, _):
            w0 = i * csz
            tchunk = scratch["wa"][pl.ds(w0, csz)]
            mchunk = mask[pl.ds(w0 % nwi, csz)] if shifted else None
            o, p_all, tfull = attend(tchunk, mchunk)
            if save_attn is not None:
                p_ref, tf_ref, jj = save_attn
                p_ref[jj, pl.ds(w0 * nhn, csz * nhn)] = p_all.reshape(
                    csz * nhn, n)
                tf_ref[jj, pl.ds(w0 * n, csz * n)] = tfull.reshape(
                    csz * n, c2)
            scratch["wb"][pl.ds(w0, csz)] = o
            return 0
        jax.lax.fori_loop(0, nw // csz, chunk, 0)
        out = scratch["wb"][...]
    else:
        assert save_attn is None
        def chunk(i, out_buf):
            w0 = i * csz
            tchunk = jax.lax.dynamic_slice(tok, (w0, 0, 0), (csz, n, c))
            mchunk = (jax.lax.dynamic_slice(mask, (w0 % nwi, 0, 0), (csz, n, n))
                      if shifted else None)
            return jax.lax.dynamic_update_slice(
                out_buf, attend(tchunk, mchunk)[0], (w0, 0, 0))
        out = jax.lax.fori_loop(
            0, nw // csz, chunk, jnp.zeros((nw, n, c), cdt))
    y = _unwindow_tokens(out, g, dims)
    if shifted:
        y = jnp.roll(y, (dims.shift, dims.shift), axis=(1, 2))
    return y, xhat1, inv1


def _mlp_branch_fwd(x2, pd, dims: TrunkDims, tch: int = None, scratch=None,
                    save_mlp=None):
    """LN2 -> fc1 -> gelu -> fc2, fori_loop-chunked over token rows.

    ``scratch["f1"]`` stages x2 in the COMPUTE dtype (x2 is already cdt, so
    this is exact) and each chunk upcasts to f32 for the LN statistics.

    ``save_mlp``: optional (gl_ref, gp_ref) pallas refs of shape
    (G*H*W, Ch) in cdt - when given, each chunk also stores gelu(h) and
    gelu'(h) so the backward skips the fc1 recompute and the erf chains.
    """
    if tch is None:
        tch = _env_int("SEI_TRUNK_TCH", 4608)
    cdt = x2.dtype
    g = x2.shape[0]
    c = dims.c
    flat = x2.reshape(g * dims.h * dims.w, c)
    nt = flat.shape[0]
    csz = _chunk_size(nt, tch)
    fc1_w = pd["fc1_w"].astype(cdt)
    fc2_w = pd["fc2_w"].astype(cdt)

    def ff(chunk_cdt):
        z32, _, _ = _ln_fwd(chunk_cdt.astype(jnp.float32),
                            pd["ln2_s"], pd["ln2_b"])
        h32 = _dot(z32.astype(cdt), fc1_w) + pd["fc1_b"]
        fast = _use_fast_gelu(cdt)
        if save_mlp is not None:
            gelu32, gp32 = (_gelu_pair_fast if fast else _gelu_pair)(h32)
            gelu = gelu32.astype(cdt)
            out_c = (_dot(gelu, fc2_w) + pd["fc2_b"]).astype(cdt)
            return out_c, gelu, gp32.astype(cdt)
        gelu = (_gelu_fast if fast else _gelu_exact)(h32).astype(cdt)
        return (_dot(gelu, fc2_w) + pd["fc2_b"]).astype(cdt)

    if scratch is not None:
        scratch["f1"][...] = flat

        def chunk(i, _):
            t0 = i * csz
            res = ff(scratch["f1"][pl.ds(t0, csz)])
            if save_mlp is not None:
                gl_ref, gp_ref, jj = save_mlp
                m, gl, gp = res
                gl_ref[jj, pl.ds(t0, csz)] = gl
                gp_ref[jj, pl.ds(t0, csz)] = gp
            else:
                m = res
            scratch["ta"][pl.ds(t0, csz)] = m
            return 0
        jax.lax.fori_loop(0, nt // csz, chunk, 0)
        out = scratch["ta"][...]
    else:
        assert save_mlp is None
        def chunk(i, out_buf):
            t0 = i * csz
            m = ff(jax.lax.dynamic_slice(flat, (t0, 0), (csz, c)))
            return jax.lax.dynamic_update_slice(out_buf, m, (t0, 0))
        out = jax.lax.fori_loop(
            0, nt // csz, chunk, jnp.zeros((nt, c), cdt))
    return out.reshape(g, dims.h, dims.w, c)


def _block_fwd_image(x, pd, rpb_d, mask, dpm_attn, dpm_mlp, dims: TrunkDims,
                     shifted: bool, scratch=None, save_mlp=None,
                     save_attn=None):
    """One SwinBlock on one image group (G, H, W, C).

    ``dpm_attn``/``dpm_mlp``: per-image drop-path keep factors, broadcastable
    against (G, H, W, C) - independent per residual branch (matching the
    unfused DropPath's two make_rng draws per block).

    Returns (out, x2): the mid-block residual x2 is ALSO saved to HBM by the
    forward kernel so the backward can skip the full attention recompute
    (the dominant share of the remat cost).  ``save_mlp``: optional
    (gl_ref, gp_ref) refs for the gelu/gelu' saves (see _mlp_branch_fwd).
    """
    _prof_skip = _prof_skip_set()
    if "fattn" in _prof_skip:
        y = x
    else:
        y, _, _ = _attn_branch_fwd(x, pd, rpb_d, mask, dims, shifted,
                                   scratch=scratch, save_attn=save_attn)
    x2 = (x.astype(jnp.float32) + dpm_attn * y.astype(jnp.float32)).astype(x.dtype)
    m = x2 if "fmlp" in _prof_skip else _mlp_branch_fwd(
        x2, pd, dims, scratch=scratch, save_mlp=save_mlp)
    out = (x2.astype(jnp.float32) + dpm_mlp * m.astype(jnp.float32)).astype(x.dtype)
    return out, x2


def _block_bwd_image(dout, x, x2, pd, rpb_d, mask, dpm_attn, dpm_mlp,
                     dims: TrunkDims, shifted: bool, wch: int = None,
                     tch: int = None, scratch=None, mlp_saved=None,
                     attn_saved=None):
    """Backward of one block for one image group; recomputes internals
    chunked (remat style).  ``x2`` (the mid-block residual) arrives from the
    forward's HBM save, so only LN1 statistics - not the whole attention
    branch - need recomputing.  Chunk loops carry only the f32 grad
    accumulators; bulk buffers stage through ``scratch`` refs on the kernel
    path.

    Returns (dx, grads dict (f32, unstacked), drpb_d (nh, N, N) f32).
    """
    if wch is None:
        wch = _env_int("SEI_TRUNK_WCH", 12)
    if tch is None:
        tch = _env_int("SEI_TRUNK_TCH", 4608)
    _prof_skip = _prof_skip_set()
    cdt = x.dtype
    g = x.shape[0]
    c = dims.c
    hd = c // dims.nh
    ch = dims.ch
    n = dims.ws * dims.ws
    nwi = (dims.h // dims.ws) * (dims.w // dims.ws)
    qkv_w = pd["qkv_w"].astype(cdt)
    proj_w = pd["proj_w"].astype(cdt)
    fc1_w = pd["fc1_w"].astype(cdt)
    fc2_w = pd["fc2_w"].astype(cdt)
    rpb32 = rpb_d.astype(jnp.float32)
    gr = {}
    z32_ = jnp.float32

    # LN1 statistics only (the attention forward itself was saved as x2)
    _, xhat1, inv1 = _ln_fwd(x.astype(jnp.float32), pd["ln1_s"], pd["ln1_b"])

    do32 = dout.astype(jnp.float32)

    # ---- MLP branch backward (chunked over token rows) ---------------------
    x2flat = x2.reshape(g * dims.h * dims.w, c)  # cdt, exact
    dmflat = (dpm_mlp * do32).reshape(g * dims.h * dims.w, c)
    nt = x2flat.shape[0]
    csz = _chunk_size(nt, tch)

    def mlp_bwd(x2c_cdt, dm, saved=None):
        z32, xhat2, inv2 = _ln_fwd(x2c_cdt.astype(jnp.float32),
                                   pd["ln2_s"], pd["ln2_b"])
        zc = z32.astype(cdt)
        if saved is not None:
            gelu, gp_c = saved  # fwd-saved gelu(h), gelu'(h) in cdt
        else:
            h32 = _dot(zc, fc1_w) + pd["fc1_b"]
            # the recompute MUST use the same gelu variant as the forward
            if _use_fast_gelu(cdt):
                gelu32, gp32 = _gelu_pair_fast(h32)
            else:
                gelu32, gp32 = _gelu_exact(h32), _gelu_grad(h32)
            gelu = gelu32.astype(cdt)
            gp_c = None
        g_fc2w = _dot(gelu, dm.astype(cdt), transpose_a=True)
        g_fc2b = jnp.sum(dm, axis=0)
        dg = _dot(dm.astype(cdt), fc2_w, transpose_b=True)
        dh = dg * (gp_c.astype(jnp.float32) if saved is not None else gp32)
        g_fc1w = _dot(zc, dh.astype(cdt), transpose_a=True)
        g_fc1b = jnp.sum(dh, axis=0)
        dz = _dot(dh.astype(cdt), fc1_w, transpose_b=True)
        g_ln2s = jnp.sum(dz * xhat2, axis=0)
        g_ln2b = jnp.sum(dz, axis=0)
        dx2_c = _ln_bwd(dz, xhat2, inv2, pd["ln2_s"])
        return dx2_c, (g_fc1w, g_fc1b, g_fc2w, g_fc2b, g_ln2s, g_ln2b)

    mlp_init = (jnp.zeros((c, ch), z32_), jnp.zeros((ch,), z32_),
                jnp.zeros((ch, c), z32_), jnp.zeros((c,), z32_),
                jnp.zeros((c,), z32_), jnp.zeros((c,), z32_))
    if "mlp" in _prof_skip:
        dx2_b, accs = jnp.zeros((nt, c), z32_), mlp_init
    elif scratch is not None:
        scratch["f1"][...] = x2flat
        scratch["f2"][...] = dmflat

        def mlp_chunk(i, accs):
            t0 = i * csz
            saved = (None if mlp_saved is None else
                     (mlp_saved[0][mlp_saved[2], pl.ds(t0, csz)],
                      mlp_saved[1][mlp_saved[2], pl.ds(t0, csz)]))
            dx2_c, gs = mlp_bwd(scratch["f1"][pl.ds(t0, csz)],
                                scratch["f2"][pl.ds(t0, csz)], saved)
            scratch["f3"][pl.ds(t0, csz)] = dx2_c
            return tuple(a + gg for a, gg in zip(accs, gs))

        accs = jax.lax.fori_loop(0, nt // csz, mlp_chunk, mlp_init)
        dx2_b = scratch["f3"][...]
    else:
        def mlp_chunk(i, carry):
            buf, accs = carry
            t0 = i * csz
            dx2_c, gs = mlp_bwd(
                jax.lax.dynamic_slice(x2flat, (t0, 0), (csz, c)),
                jax.lax.dynamic_slice(dmflat, (t0, 0), (csz, c)))
            buf = jax.lax.dynamic_update_slice(buf, dx2_c, (t0, 0))
            return (buf, tuple(a + gg for a, gg in zip(accs, gs)))

        dx2_b, accs = jax.lax.fori_loop(
            0, nt // csz, mlp_chunk,
            (jnp.zeros((nt, c), z32_), mlp_init))
    (gr["fc1_w"], gr["fc1_b"], gr["fc2_w"], gr["fc2_b"],
     gr["ln2_s"], gr["ln2_b"]) = accs
    dx2 = do32 + dx2_b.reshape(g, dims.h, dims.w, c)

    # ---- attention branch backward (chunked over window groups) ------------
    dy = (dpm_attn * dx2).astype(cdt)
    if shifted:
        dy = jnp.roll(dy, (-dims.shift, -dims.shift), axis=(1, 2))
    do_tok = _window_tokens(dy, dims)  # (G*nW, N, C)

    # recompute LN1 output tokens (shared by all chunks)
    a32 = xhat1 * pd["ln1_s"] + pd["ln1_b"]
    a = a32.astype(cdt)
    if shifted:
        a = jnp.roll(a, (-dims.shift, -dims.shift), axis=(1, 2))
    a_tok = _window_tokens(a, dims)

    nw = a_tok.shape[0]
    wcs = _chunk_size(nwi, wch)

    tiles = _head_tiling(dims.nh, hd)
    c2 = len(tiles) * _TL
    scale = hd ** -0.5

    def attn_bwd(ac_, doc_, mchunk, saved=None):
        ac = ac_.reshape(wcs * n, c)
        qkv = (_dot(ac, qkv_w) + pd["qkv_b"]).astype(cdt)
        q = qkv[:, :c2].reshape(wcs, n, c2)
        k = qkv[:, c2 : 2 * c2].reshape(wcs, n, c2)
        v = qkv[:, 2 * c2 :].reshape(wcs, n, c2)
        doc = doc_.reshape(wcs * n, c)
        dt = _dot(doc.astype(cdt), proj_w, transpose_b=True)  # (.., C2) f32
        dtc = dt.astype(cdt).reshape(wcs, n, c2)
        if saved is not None:
            # fwd-saved softmax probs (all tiles' rows stacked per window)
            p_all = saved[0].reshape(wcs, dims.nh * n, n)

        t_parts, dq_parts, dk_parts, dv_parts, rpb_parts = [], [], [], [], []
        r0 = 0
        for t2, (h0, ht) in enumerate(tiles):
            sl = slice(t2 * _TL, (t2 + 1) * _TL)
            q_t, k_t, v_t = q[..., sl], k[..., sl], v[..., sl]
            hm = _tile_head_mask(ht, hd)
            hmc = hm[None, :, None, :].astype(cdt)
            qm = (q_t[:, None] * hmc).reshape(wcs, ht * n, _TL)
            if saved is not None:
                pc = p_all[:, r0 : r0 + ht * n]
                p = pc.astype(jnp.float32)
                r0 += ht * n
            else:
                s = _bdot(qm, k_t, transpose_b=True) * scale  # (wcs, ht*N, N)
                s = s.reshape(wcs, ht, n, n) + rpb32[h0 : h0 + ht][None]
                if shifted:
                    s = s + mchunk.reshape(wcs, 1, n, n).astype(jnp.float32)
                s = s.reshape(wcs, ht * n, n)
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                p = e / jnp.sum(e, axis=-1, keepdims=True)  # f32
                pc = p.astype(cdt)
            if saved is None:
                att = _bdot(pc, v_t)  # (wcs, ht*N, TL) f32
                t_parts.append(jnp.sum(
                    att.reshape(wcs, ht, n, _TL) * hm[None, :, None, :],
                    axis=1).astype(cdt))
            # d(att_h) = dt_tile .* m_h (head h owns its lane slice)
            davm = (dtc[..., sl][:, None] * hmc).reshape(wcs, ht * n, _TL)
            dp = _bdot(davm, v_t, transpose_b=True)  # (wcs, ht*N, N) f32
            dv_parts.append(_bdot_rows(pc, davm))    # (wcs, N, TL) f32
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            rpb_parts.append(jnp.sum(ds.reshape(wcs, ht, n, n), axis=0))
            dsc = ds.astype(cdt)
            dqm = _bdot(dsc, k_t) * scale  # (wcs, ht*N, TL) f32
            dq_parts.append(jnp.sum(
                dqm.reshape(wcs, ht, n, _TL) * hm[None, :, None, :], axis=1))
            dk_parts.append(_bdot_rows(dsc, qm) * scale)  # (wcs, N, TL)

        if saved is not None:
            g_projw = _dot(saved[1], doc.astype(cdt),
                           transpose_a=True)  # (C2, C), fwd-saved tfull
        else:
            tfull = jnp.concatenate(t_parts, axis=-1)  # (wcs, N, C2)
            g_projw = _dot(tfull.reshape(wcs * n, c2), doc.astype(cdt),
                           transpose_a=True)  # (C2, C)
        g_projb = jnp.sum(doc.astype(jnp.float32), axis=0)
        g_rpb = jnp.concatenate(rpb_parts, axis=0)  # (nh, N, N)
        dq = jnp.concatenate(dq_parts, axis=-1)
        dk = jnp.concatenate(dk_parts, axis=-1)
        dv = jnp.concatenate(dv_parts, axis=-1)
        dqkv = jnp.concatenate(
            [dq.astype(cdt).reshape(wcs * n, c2),
             dk.astype(cdt).reshape(wcs * n, c2),
             dv.astype(cdt).reshape(wcs * n, c2)], axis=-1)
        g_qkvw = _dot(ac, dqkv, transpose_a=True)  # (C, 3*C2)
        g_qkvb = jnp.sum(dqkv.astype(jnp.float32), axis=0)
        da_c = _dot(dqkv, qkv_w, transpose_b=True).astype(cdt)
        return (da_c.reshape(wcs, n, c),
                (g_qkvw, g_qkvb, g_projw, g_projb, g_rpb))

    attn_init = (jnp.zeros((c, 3 * c2), z32_), jnp.zeros((3 * c2,), z32_),
                 jnp.zeros((c2, c), z32_), jnp.zeros((c,), z32_),
                 jnp.zeros((dims.nh, n, n), z32_))
    if "attn" in _prof_skip:
        da_w, accs = jnp.zeros((nw, n, c), cdt), attn_init
    elif scratch is not None:
        scratch["wa"][...] = a_tok
        scratch["wb"][...] = do_tok

        nhn = dims.nh * n

        def attn_chunk(i, accs):
            w0 = i * wcs
            mchunk = mask[pl.ds(w0 % nwi, wcs)] if shifted else None
            saved = None
            if attn_saved is not None:
                p_ref, tf_ref, jj = attn_saved
                saved = (p_ref[jj, pl.ds(w0 * nhn, wcs * nhn)],
                         tf_ref[jj, pl.ds(w0 * n, wcs * n)])
            da_c, gs = attn_bwd(scratch["wa"][pl.ds(w0, wcs)],
                                scratch["wb"][pl.ds(w0, wcs)], mchunk, saved)
            scratch["wc"][pl.ds(w0, wcs)] = da_c
            return tuple(a + gg for a, gg in zip(accs, gs))

        accs = jax.lax.fori_loop(0, nw // wcs, attn_chunk, attn_init)
        da_w = scratch["wc"][...]
    else:
        def attn_chunk(i, carry):
            buf, accs = carry
            w0 = i * wcs
            mchunk = (jax.lax.dynamic_slice(mask, (w0 % nwi, 0, 0), (wcs, n, n))
                      if shifted else None)
            da_c, gs = attn_bwd(
                jax.lax.dynamic_slice(a_tok, (w0, 0, 0), (wcs, n, c)),
                jax.lax.dynamic_slice(do_tok, (w0, 0, 0), (wcs, n, c)),
                mchunk)
            buf = jax.lax.dynamic_update_slice(buf, da_c, (w0, 0, 0))
            return (buf, tuple(a + gg for a, gg in zip(accs, gs)))

        da_w, accs = jax.lax.fori_loop(
            0, nw // wcs, attn_chunk,
            (jnp.zeros((nw, n, c), cdt), attn_init))
    (gr["qkv_w"], gr["qkv_b"], gr["proj_w"], gr["proj_b"], drpb) = accs

    da = _unwindow_tokens(da_w, g, dims)
    if shifted:
        da = jnp.roll(da, (dims.shift, dims.shift), axis=(1, 2))
    da32 = da.astype(jnp.float32)
    gr["ln1_s"] = jnp.sum(da32 * xhat1, axis=(0, 1, 2))
    gr["ln1_b"] = jnp.sum(da32, axis=(0, 1, 2))
    dx = dx2 + _ln_bwd(da32, xhat1, inv1, pd["ln1_s"])
    return dx.astype(cdt), gr, drpb



def _slice_pd(params, d):
    return {k: v[d] for k, v in params.items()}


# ---------------------------------------------------------------------------
# Pure-JAX reference (and non-TPU fallback)
# ---------------------------------------------------------------------------


def trunk_reference(x, params, rpb, mask, dpm, *, num_heads, window_size):
    """Batched trunk forward via the same per-group block function (G=1)."""
    dims = make_dims(x.shape, params, num_heads, window_size)
    params = pack_attn_params(params, num_heads)
    mask_arr = _mask_array(mask, dims)

    def per_image(xi, dpm_i):
        xg = xi[None]
        for d in range(dims.d):
            shifted = (d % 2 == 1) and dims.shift > 0
            xg, _ = _block_fwd_image(xg, _slice_pd(params, d), rpb[d],
                                     mask_arr, dpm_i[d, 0], dpm_i[d, 1],
                                     dims, shifted)
        return xg[0]

    return jax.vmap(per_image, in_axes=(0, 2))(x, dpm)


def _mask_array(mask, dims: TrunkDims):
    """bf16 in VMEM (0/-100 are exact); cast to f32 at the softmax add."""
    n = dims.ws * dims.ws
    nw = (dims.h // dims.ws) * (dims.w // dims.ws)
    if mask is None:
        return jnp.zeros((nw, n, n), jnp.bfloat16)
    return jnp.asarray(mask, jnp.bfloat16)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------
#
# Mosaic requires the last two dims of every block shape to be divisible by
# (8, 128) or equal to the full array dims.  Stacked leaves are therefore
# reshaped (D, ...) -> (P, 2, ...) so the per-pair block (1, 2, ...) always
# ends in full dimensions; the drop-path masks ride in SMEM (scalar reads
# with dynamic indices).

_W_ORDER = PARAM_LEAVES  # ref order for positional plumbing


def _pairize(arr):
    """(D, ...) -> (D//2, 2, ...)."""
    return arr.reshape((arr.shape[0] // 2, 2) + arr.shape[1:])


def _dpm_group(dpm_ref, d, branch, ib, dims: TrunkDims):
    """(G, 1, 1, 1) f32 keep-factor vector from SMEM scalars.

    Mosaic cannot form a vector from scalars directly; build it as a sum of
    iota-one-hot selects (G is small and static).
    """
    giota = jax.lax.broadcasted_iota(jnp.int32, (dims.g, 1, 1, 1), 0)
    acc = jnp.zeros((dims.g, 1, 1, 1), jnp.float32)
    for gg in range(dims.g):
        acc = acc + jnp.where(
            giota == gg, dpm_ref[d, branch, ib * dims.g + gg], 0.0
        )
    return acc


def _fwd_kernel(dims: TrunkDims, mode: str,
                x_ref, *rest):
    """mode: "full" (xs/xs2 + gelu/p/tfull saves, bf16 training),
    "xs" (xs/xs2 only - the recompute backward, f32 training),
    "none" (y only - the eval primal)."""
    refs = list(rest)
    w_refs = {k: refs.pop(0) for k in _W_ORDER}
    if mode == "full":
        (rpb_ref, mask_ref, dpm_ref, y_ref, xs_ref, xs2_ref, gl_ref, gp_ref,
         p_ref, tf_ref, x_scr, wa, wb, ta, f1) = refs
    elif mode == "xs":
        (rpb_ref, mask_ref, dpm_ref, y_ref, xs_ref, xs2_ref,
         x_scr, wa, wb, ta, f1) = refs
    else:
        (rpb_ref, mask_ref, dpm_ref, y_ref,
         x_scr, wa, wb, ta, f1) = refs
    scratch = {"wa": wa, "wb": wb, "ta": ta, "f1": f1}
    ib = pl.program_id(0)
    ip = pl.program_id(1)  # pair index
    npairs = dims.d // 2

    @pl.when(ip == 0)
    def _():
        x_scr[...] = x_ref[...]

    x = x_scr[...]
    for j in range(2):  # (no-shift, shift) pair
        if mode != "none":
            xs_ref[j] = x
        pd = {k: w_refs[k][0, j] for k in _W_ORDER}
        shifted = (j == 1) and dims.shift > 0
        d_idx = 2 * ip + j
        dpm_a = _dpm_group(dpm_ref, d_idx, 0, ib, dims)
        dpm_m = _dpm_group(dpm_ref, d_idx, 1, ib, dims)
        x, x2 = _block_fwd_image(
            x, pd, rpb_ref[0, j], mask_ref, dpm_a, dpm_m, dims, shifted,
            scratch=scratch,
            save_mlp=(gl_ref, gp_ref, j) if mode == "full" else None,
            save_attn=(p_ref, tf_ref, j) if mode == "full" else None)
        if mode != "none":
            xs2_ref[j] = x2
    x_scr[...] = x

    @pl.when(ip == npairs - 1)
    def _():
        y_ref[...] = x


def _bwd_kernel(dims: TrunkDims, with_saved: bool,
                dy_ref, *rest):
    refs = list(rest)
    w_refs = {k: refs.pop(0) for k in _W_ORDER}
    if with_saved:
        (rpb_ref, mask_ref, dpm_ref, xs_ref, xs2_ref, gl_ref, gp_ref,
         p_ref, tf_ref, dx_ref, drpb_ref) = refs[:11]
        refs = refs[11:]
    else:
        (rpb_ref, mask_ref, dpm_ref, xs_ref, xs2_ref,
         dx_ref, drpb_ref) = refs[:7]
        refs = refs[7:]
    dw_refs = {k: r for k, r in zip(_W_ORDER, refs[:12])}
    dx_scr, wa, wb, wc, f1, f2, f3 = refs[12:19]
    scratch = {"wa": wa, "wb": wb, "wc": wc, "f1": f1, "f2": f2, "f3": f3}
    ib = pl.program_id(0)
    ip = pl.program_id(1)  # pair axis walked in reverse via the index maps
    npairs = dims.d // 2
    pair = npairs - 1 - ip  # actual pair index (for the SMEM dpm lookup)

    @pl.when(ip == 0)
    def _():
        dx_scr[...] = dy_ref[...]

    dx = dx_scr[...]
    for j in (1, 0):  # reverse within the pair
        x_in = xs_ref[j]
        x2_in = xs2_ref[j]
        pd = {k: w_refs[k][0, j] for k in _W_ORDER}
        shifted = (j == 1) and dims.shift > 0
        d_idx = 2 * pair + j
        dpm_a = _dpm_group(dpm_ref, d_idx, 0, ib, dims)
        dpm_m = _dpm_group(dpm_ref, d_idx, 1, ib, dims)
        dx, gr, drpb_d = _block_bwd_image(
            dx, x_in, x2_in, pd, rpb_ref[0, j], mask_ref, dpm_a, dpm_m,
            dims, shifted, scratch=scratch,
            mlp_saved=(gl_ref, gp_ref, j) if with_saved else None,
            attn_saved=(p_ref, tf_ref, j) if with_saved else None)
        for k in _W_ORDER:
            dw_refs[k][0, 0, j] = gr[k].astype(dw_refs[k].dtype)
        drpb_ref[0, 0, j] = drpb_d
    dx_scr[...] = dx

    @pl.when(ip == npairs - 1)
    def _():
        dx_ref[...] = dx


def _pair_spec(shp_pairized, index_map):
    """BlockSpec for one (1, 2, ...) pair block of a pairized array."""
    nd = len(shp_pairized) - 2
    return pl.BlockSpec((1, 2) + shp_pairized[2:],
                        (lambda im: (lambda ib, ip: im(ib, ip) + (0,) * nd))(index_map),
                        memory_space=pltpu.VMEM)


def _fwd_pallas(x, params, rpb, mask, dpm, dims: TrunkDims, interpret=False,
                mode="full"):
    npairs = dims.d // 2
    n = dims.ws * dims.ws
    nw = (dims.h // dims.ws) * (dims.w // dims.ws)
    g = dims.g
    pparams = {k: _pairize(params[k]) for k in _W_ORDER}
    prpb = _pairize(rpb)
    fwd_im = lambda ib, ip: (ip, 0)
    in_specs = [
        pl.BlockSpec((g, dims.h, dims.w, dims.c), lambda ib, ip: (ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        *[_pair_spec(pparams[k].shape, fwd_im) for k in _W_ORDER],
        _pair_spec(prpb.shape, fwd_im),
        pl.BlockSpec((nw, n, n), lambda ib, ip: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # dpm (D, 2, B), dynamic reads
    ]
    xs_spec = pl.BlockSpec((2, g, dims.h, dims.w, dims.c),
                           lambda ib, ip: (ip, ib, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    xs_shape = jax.ShapeDtypeStruct(
        (dims.d, dims.b, dims.h, dims.w, dims.c), x.dtype)
    # gelu/gelu' saves: (D, B*H*W, Ch) flattened rows so the kernel's chunk
    # loop can store with one pl.ds row offset per chunk
    l = dims.h * dims.w
    gl_spec = pl.BlockSpec((2, g * l, dims.ch),
                           lambda ib, ip: (ip, ib, 0),
                           memory_space=pltpu.VMEM)
    gl_shape = jax.ShapeDtypeStruct((dims.d, dims.b * l, dims.ch), x.dtype)
    # softmax probs: per window, all tiles' (ht*N) rows stacked -> nh*N rows
    nhn = dims.nh * n
    c2 = len(_head_tiling(dims.nh, dims.c // dims.nh)) * _TL
    p_spec = pl.BlockSpec((2, g * nw * nhn, n), lambda ib, ip: (ip, ib, 0),
                          memory_space=pltpu.VMEM)
    p_shape = jax.ShapeDtypeStruct((dims.d, dims.b * nw * nhn, n), x.dtype)
    tf_spec = pl.BlockSpec((2, g * nw * n, c2), lambda ib, ip: (ip, ib, 0),
                           memory_space=pltpu.VMEM)
    tf_shape = jax.ShapeDtypeStruct((dims.d, dims.b * nw * n, c2), x.dtype)
    y_spec = pl.BlockSpec((g, dims.h, dims.w, dims.c),
                          lambda ib, ip: (ib, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    if mode == "full":
        out_specs = (y_spec, xs_spec, xs_spec, gl_spec, gl_spec,
                     p_spec, tf_spec)
        out_shapes = (jax.ShapeDtypeStruct(x.shape, x.dtype), xs_shape,
                      xs_shape, gl_shape, gl_shape, p_shape, tf_shape)
    elif mode == "xs":
        out_specs = (y_spec, xs_spec, xs_spec)
        out_shapes = (jax.ShapeDtypeStruct(x.shape, x.dtype), xs_shape,
                      xs_shape)
    else:
        out_specs = (y_spec,)
        out_shapes = (jax.ShapeDtypeStruct(x.shape, x.dtype),)
    mask_arr = _mask_array(mask, dims)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, dims, mode),
        grid=(dims.b // g, npairs),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((g, dims.h, dims.w, dims.c), x.dtype),
            pltpu.VMEM((g * nw, n, dims.c), x.dtype),   # wa: window tokens
            pltpu.VMEM((g * nw, n, dims.c), x.dtype),   # wb: attn out tokens
            pltpu.VMEM((g * dims.h * dims.w, dims.c), x.dtype),  # ta: mlp out
            pltpu.VMEM((g * dims.h * dims.w, dims.c), x.dtype),  # f1 (cdt)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(x, *[pparams[k] for k in _W_ORDER], prpb, mask_arr, dpm)
    return outs


def _bwd_pallas(params, rpb, mask, dpm, xs, xs2, gl, gp, pp, tf, dy,
                dims: TrunkDims, interpret=False):
    npairs = dims.d // 2
    n = dims.ws * dims.ws
    nw = (dims.h // dims.ws) * (dims.w // dims.ws)
    g = dims.g
    nb = dims.b // g
    pparams = {k: _pairize(params[k]) for k in _W_ORDER}
    prpb = _pairize(rpb)
    rev_im = lambda ib, ip: (npairs - 1 - ip, 0)
    in_specs = [
        pl.BlockSpec((g, dims.h, dims.w, dims.c), lambda ib, ip: (ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        *[_pair_spec(pparams[k].shape, rev_im) for k in _W_ORDER],
        _pair_spec(prpb.shape, rev_im),
        pl.BlockSpec((nw, n, n), lambda ib, ip: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # dpm
        pl.BlockSpec((2, g, dims.h, dims.w, dims.c),
                     lambda ib, ip: (npairs - 1 - ip, ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),  # xs
        pl.BlockSpec((2, g, dims.h, dims.w, dims.c),
                     lambda ib, ip: (npairs - 1 - ip, ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),  # xs2
    ]
    with_saved = gl is not None
    if with_saved:
        in_specs += [
            pl.BlockSpec((2, g * dims.h * dims.w, dims.ch),
                         lambda ib, ip: (npairs - 1 - ip, ib, 0),
                         memory_space=pltpu.VMEM),  # gl (fwd-saved gelu)
            pl.BlockSpec((2, g * dims.h * dims.w, dims.ch),
                         lambda ib, ip: (npairs - 1 - ip, ib, 0),
                         memory_space=pltpu.VMEM),  # gp (fwd-saved gelu')
            pl.BlockSpec((2, g * nw * dims.nh * n, n),
                         lambda ib, ip: (npairs - 1 - ip, ib, 0),
                         memory_space=pltpu.VMEM),  # p (fwd-saved probs)
            pl.BlockSpec((2, g * nw * n,
                          len(_head_tiling(dims.nh,
                                           dims.c // dims.nh)) * _TL),
                         lambda ib, ip: (npairs - 1 - ip, ib, 0),
                         memory_space=pltpu.VMEM),  # tfull (fwd-saved)
        ]
    # outputs: dx (B,...); PER-GROUP drpb and weight grads (B//G, P, 2, ...)
    # that XLA sum-reduces over groups afterwards (keeps VMEM small).
    out_specs = [
        pl.BlockSpec((g, dims.h, dims.w, dims.c), lambda ib, ip: (ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 2, dims.nh, n, n),
                     lambda ib, ip: (ib, npairs - 1 - ip, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((dims.b, dims.h, dims.w, dims.c), dy.dtype),
        jax.ShapeDtypeStruct((nb, npairs, 2, dims.nh, n, n), jnp.float32),
    ]
    for k in _W_ORDER:
        pshp = pparams[k].shape  # (P, 2, ...)
        nd = len(pshp) - 2
        out_specs.append(pl.BlockSpec(
            (1, 1, 2) + pshp[2:],
            (lambda m: (lambda ib, ip: (ib, npairs - 1 - ip, 0) + (0,) * m))(nd),
            memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(
            (nb,) + pshp, jnp.float32))

    mask_arr = _mask_array(mask, dims)
    saved_args = (gl, gp, pp, tf) if with_saved else ()
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, dims, with_saved),
        grid=(nb, npairs),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[
            pltpu.VMEM((g, dims.h, dims.w, dims.c), dy.dtype),
            pltpu.VMEM((g * nw, n, dims.c), dy.dtype),  # wa
            pltpu.VMEM((g * nw, n, dims.c), dy.dtype),  # wb
            pltpu.VMEM((g * nw, n, dims.c), dy.dtype),  # wc
            pltpu.VMEM((g * dims.h * dims.w, dims.c), dy.dtype),  # f1 (cdt)
            pltpu.VMEM((g * dims.h * dims.w, dims.c), jnp.float32),  # f2
            pltpu.VMEM((g * dims.h * dims.w, dims.c), jnp.float32),  # f3
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(dy, *[pparams[k] for k in _W_ORDER], prpb, mask_arr, dpm, xs, xs2,
      *saved_args)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 5, 6, 7, 8))
def _trunk_pallas(x, params, rpb, mask, dpm, num_heads, window_size,
                  interpret, gs):
    # primal (no-grad) path: save-free forward with its own (bigger) group
    dims = make_dims(x.shape, params, num_heads, window_size, g=gs[2])
    y = _fwd_pallas(x, params, rpb, mask, dpm, dims, interpret=interpret,
                    mode="none")[0]
    return y


def _trunk_fwd(x, params, rpb, mask, dpm, num_heads, window_size, interpret,
               gs):
    dims = make_dims(x.shape, params, num_heads, window_size, g=gs[0])
    if gs[3]:  # save-carrying forward (bf16 training)
        y, xs, xs2, gl, gp, pp, tf = _fwd_pallas(
            x, params, rpb, mask, dpm, dims, interpret=interpret)
    else:      # xs-only forward + recompute backward (f32 / large shapes)
        y, xs, xs2 = _fwd_pallas(x, params, rpb, mask, dpm, dims,
                                 interpret=interpret, mode="xs")
        gl = gp = pp = tf = None
    return y, (x.shape, params, rpb, dpm, xs, xs2, gl, gp, pp, tf)


def _trunk_bwd(mask, num_heads, window_size, interpret, gs, res, dy):
    x_shape, params, rpb, dpm, xs, xs2, gl, gp, pp, tf = res
    dims = make_dims(x_shape, params, num_heads, window_size, g=gs[1])
    dx, dparams, drpb = _bwd_pallas(params, rpb, mask, dpm, xs, xs2, gl, gp,
                                    pp, tf, dy, dims, interpret=interpret)
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
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """D SwinBlocks on (B, H, W, C); see module docstring for layouts.

    ``mask`` must be a trace-time numpy constant (it rides in custom_vjp
    nondiff_argnums).  Falls back to the pure-JAX reference off-TPU unless
    ``interpret`` (or env SEI_TRUNK_INTERPRET=1) forces the kernel through
    the Pallas interpreter - used to exercise the production kernel+sharding
    composition on the virtual CPU mesh.
    """
    import os

    if interpret is None:
        interpret = os.environ.get("SEI_TRUNK_INTERPRET", "") not in ("", "0")
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    if not use_pallas and not interpret:
        return trunk_reference(x, params, rpb, mask, dpm,
                               num_heads=num_heads, window_size=window_size)
    if mask is not None:
        assert isinstance(mask, np.ndarray), "mask must be a numpy constant"
        mask = np.ascontiguousarray(mask, dtype=np.float32)
    b, h, w, c = x.shape
    # The gelu/gelu'/p/tfull saves pay for themselves in bf16 (the r3u/r3x
    # probes: 6-RSTB chain grad 29.8 -> 24.0 ms) but their f32 blocks
    # overflow the Mosaic VMEM allocator even at G=1 (measured r3x), so f32
    # training keeps the bit-exact recompute backward.
    saves_on = x.dtype == jnp.bfloat16
    env_saves = os.environ.get("SEI_TRUNK_SAVES")
    if env_saves is not None:
        saves_on = env_saves not in ("0", "false", "")
    gs = (
        # fwd-with-saves / bwd carry ~2x-buffered save blocks: at 48px bf16
        # per-image ~16.6 MB -> G=1 (G=2 overflows the Mosaic allocator,
        # measured r3w); the save-free primal keeps the old roomier budget.
        _pick_group(b, h, w, c, x.dtype.itemsize, 23 if saves_on else 52,
                    "SEI_TRUNK_G"),
        _pick_group(b, h, w, c, x.dtype.itemsize, 23 if saves_on else 29,
                    "SEI_TRUNK_G_BWD"),
        _pick_group(b, h, w, c, x.dtype.itemsize, 52, "SEI_TRUNK_G_EVAL"),
        saves_on,
    )
    # tile-aligned head packing (exact 0/1 matmuls OUTSIDE the custom_vjp,
    # so autodiff maps the packed-layout grads back to the raw params)
    params = pack_attn_params(params, num_heads)
    return _trunk_pallas(x, params, rpb.astype(jnp.float32), mask, dpm,
                         num_heads, window_size, interpret, gs)
