#!/usr/bin/env python
"""Round-3s probe: is _dpm_group (dynamic SMEM scalar reads + iota one-hot
vector builds) the hidden ~1.3 ms/call cost?

  v_d  : r3r's skipALL-equivalent body (1.0 ms device for 6 calls)
  v_g  : v_d + 4x _dpm_group per pair step (the real body's reads)
  v_h  : the REAL _fwd_pallas with SEI_TRUNK_PROF_SKIP=fattn,fmlp (control;
         expect ~10.3 total if r3o/r3q hold)
All dedup-proof (fresh scale factors; x offset by session-unique constant).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

os.makedirs("/root/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")

b, h, w, c, d, nh, ws = 8, 48, 48, 180, 6, 6, 8
n = ws * ws
ch = int(c * 2.0)
g = 2
npairs = d // 2
nw = (h // ws) * (w // ws)
OFF = 777.0  # session-unique input offset to dodge the cross-process cache


def timeit(fn, x, iters=20, windows=3):
    ts = [jnp.float32(OFF + i) for i in range(iters * windows + 1)]
    out = fn(x, ts[0])
    jax.block_until_ready(out)
    meds = []
    k = 1
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x, ts[k])
            k += 1
        jax.block_until_ready(out)
        meds.append((time.perf_counter() - t0) / iters * 1000)
    return sorted(meds)[len(meds) // 2]


def main():
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.02, jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)

    wshapes = {
        "ln1_s": (npairs, 2, c), "ln1_b": (npairs, 2, c),
        "qkv_w": (npairs, 2, c, 768), "qkv_b": (npairs, 2, 768),
        "proj_w": (npairs, 2, 256, c), "proj_b": (npairs, 2, c),
        "ln2_s": (npairs, 2, c), "ln2_b": (npairs, 2, c),
        "fc1_w": (npairs, 2, c, ch), "fc1_b": (npairs, 2, ch),
        "fc2_w": (npairs, 2, ch, c), "fc2_b": (npairs, 2, c),
    }
    ws_arrs = [f32(*s) for s in wshapes.values()]
    rpb = f32(npairs, 2, nh, n, n)
    mask = jnp.asarray(rng.standard_normal((nw, n, n)), jnp.bfloat16)
    dpm = jnp.ones((d, 2, b), jnp.float32)

    def pair_spec(shp):
        nd = len(shp) - 2
        return pl.BlockSpec((1, 2) + shp[2:],
                            lambda ib, ip, _n=nd: (ip, 0) + (0,) * _n,
                            memory_space=pltpu.VMEM)

    xspec = pl.BlockSpec((g, h, w, c), lambda ib, ip: (ib, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    xs_spec = pl.BlockSpec((2, g, h, w, c), lambda ib, ip: (ip, ib, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    xs_shape = jax.ShapeDtypeStruct((d, b, h, w, c), x.dtype)
    in_specs_full = [
        xspec,
        *[pair_spec(s) for s in wshapes.values()],
        pair_spec(rpb.shape),
        pl.BlockSpec((nw, n, n), lambda ib, ip: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    scr = [pltpu.VMEM((g, h, w, c), x.dtype),
           pltpu.VMEM((g * nw, n, c), x.dtype),
           pltpu.VMEM((g * nw, n, c), x.dtype),
           pltpu.VMEM((g * h * w, c), x.dtype),
           pltpu.VMEM((g * h * w, c), x.dtype)]

    def dpm_group(dpm_ref, dd, branch, ib):
        giota = jax.lax.broadcasted_iota(jnp.int32, (g, 1, 1, 1), 0)
        acc = jnp.zeros((g, 1, 1, 1), jnp.float32)
        for gg in range(g):
            acc = acc + jnp.where(giota == gg,
                                  dpm_ref[dd, branch, ib * g + gg], 0.0)
        return acc

    def mk(with_dpm):
        def kern(*refs):
            refs = list(refs)
            x_ref = refs.pop(0)
            dpm_ref = refs[12 + 2]  # after 12 weights, rpb, mask
            y_ref, xsr, xs2r = refs[-8], refs[-7], refs[-6]
            x_scr = refs[-5]
            ib = pl.program_id(0)
            ip = pl.program_id(1)

            @pl.when(ip == 0)
            def _():
                x_scr[...] = x_ref[...]
            xv = x_scr[...]
            for j in range(2):
                xsr[j] = xv
                d_idx = 2 * ip + j
                if with_dpm:
                    da = dpm_group(dpm_ref, d_idx, 0, ib)
                    dm = dpm_group(dpm_ref, d_idx, 1, ib)
                else:
                    da = dm = 1.0
                x2 = (xv.astype(jnp.float32) * 1.0 + da * 0.5).astype(xv.dtype)
                xs2r[j] = x2
                xv = (x2.astype(jnp.float32) + dm * 0.25).astype(xv.dtype)
            x_scr[...] = xv

            @pl.when(ip == npairs - 1)
            def _():
                y_ref[...] = xv

        def call(xx):
            res = pl.pallas_call(
                kern, grid=(b // g, npairs), in_specs=in_specs_full,
                out_specs=(xspec, xs_spec, xs_spec),
                out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                           xs_shape, xs_shape),
                scratch_shapes=scr,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=112 * 1024 * 1024),
            )(xx, *ws_arrs, rpb, mask, dpm)
            return res[0]

        def fn(xx, t):
            xx = xx + t.astype(xx.dtype)
            for _ in range(6):
                xx = call(xx)
            return xx
        return jax.jit(fn)

    for tag, w_ in (("v_d no dpm_group", False), ("v_g with dpm_group", True)):
        try:
            ms = timeit(mk(w_), x)
            print(f"{tag:34s}: {ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{tag:34s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # control: the real kernel with skipALL
    from sei_tpu.models.swinir import shift_attn_mask
    from sei_tpu.ops import swin_trunk as st
    os.environ["SEI_TRUNK_PROF_SKIP"] = "fattn,fmlp"
    mask2 = np.asarray(shift_attn_mask(h, w, ws, ws // 2), np.float32)
    rstbs = [{k: f32(*((d,) + s[2:])) for k, s in wshapes.items()}
             for _ in range(6)]
    # fix shapes: unpacked qkv (d, c, 3c), proj (d, c, c)
    for p in rstbs:
        p["qkv_w"] = f32(d, c, 3 * c)
        p["qkv_b"] = jnp.zeros((d, 3 * c))
        p["proj_w"] = f32(d, c, c)
        p["ln1_s"] = jnp.ones((d, c)); p["ln1_b"] = jnp.zeros((d, c))
        p["ln2_s"] = jnp.ones((d, c)); p["ln2_b"] = jnp.zeros((d, c))
    rpbs = [f32(d, nh, n, n) for _ in range(6)]

    def chain(xx):
        for p, r in zip(rstbs, rpbs):
            xx = st.swin_trunk(xx, p, r, mask2, dpm, num_heads=nh,
                               window_size=ws, use_pallas=True)
        return xx

    def fn(xx, t):
        return chain(xx + t.astype(xx.dtype))
    try:
        ms = timeit(jax.jit(fn), x)
        print(f"{'v_h REAL kernel skipALL':34s}: {ms:7.2f} ms", flush=True)
    except Exception as e:
        print(f"v_h: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    os.environ.pop("SEI_TRUNK_PROF_SKIP", None)


if __name__ == "__main__":
    main()
