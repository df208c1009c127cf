#!/usr/bin/env python
"""Round-3r probe: bisect WHICH structural element of the trunk pallas call
costs ~1.5 ms/call regardless of body compute (r3q).

Six-call chains of progressively trunk-like kernels (all dedup-proof):
  v_a: x->y copy, but with the trunk's 17 in_specs (weights etc. UNUSED),
       grid (4,3), no scratch
  v_b: v_a + xs/xs2 outputs (full-size, written per step)
  v_c: v_b + VMEM scratch bufs allocated (unused)
  v_d: v_c + x_scr staging + residual-add body (== skipALL trunk)
  v_e: v_a but with only ONE input (x)   [isolates input count]
  v_f: v_a with grid=(4,) (no pair axis) [isolates 2D grid]
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


def timeit(fn, x, iters=20, windows=3):
    ts = [jnp.float32(1 + i) for i in range(iters * windows + 1)]
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

    # pairized weight arrays like _fwd_pallas
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

    def kern_a(x_ref, *rest):
        y_ref = rest[-1]
        y_ref[...] = x_ref[...] + 1.0

    def mk_a(extra_out=False, scratch=False, body=False, one_input=False,
             grid2d=True):
        grid = (b // g, npairs) if grid2d else (b // g,)
        if grid2d:
            ins = [xspec] if one_input else in_specs_full
            outs = [xspec]
            oshapes = [jax.ShapeDtypeStruct(x.shape, x.dtype)]
            if extra_out:
                outs += [xs_spec, xs_spec]
                oshapes += [xs_shape, xs_shape]
        else:
            s1 = pl.BlockSpec((g, h, w, c), lambda ib: (ib, 0, 0, 0),
                              memory_space=pltpu.VMEM)
            ins, outs = [s1], [s1]
            oshapes = [jax.ShapeDtypeStruct(x.shape, x.dtype)]
        scr = ([pltpu.VMEM((g, h, w, c), x.dtype),
                pltpu.VMEM((g * nw, n, c), x.dtype),
                pltpu.VMEM((g * nw, n, c), x.dtype),
                pltpu.VMEM((g * h * w, c), x.dtype),
                pltpu.VMEM((g * h * w, c), x.dtype)]
               if scratch else [])

        def kern(*refs):
            refs = list(refs)
            x_ref = refs.pop(0)
            nouts = 1 + (2 if extra_out else 0)
            nscr = len(scr)
            outs_refs = refs[len(refs) - nouts - nscr:
                             len(refs) - nscr] if nscr else refs[-nouts:]
            y_ref = outs_refs[0]
            if body:
                scr_refs = refs[-nscr:]
                x_scr = scr_refs[0]
                ip = pl.program_id(1)

                @pl.when(ip == 0)
                def _():
                    x_scr[...] = x_ref[...]
                xv = x_scr[...]
                for j in range(2):
                    if extra_out:
                        outs_refs[1][j] = xv
                    x2 = (xv.astype(jnp.float32) * 1.0 + 0.5).astype(xv.dtype)
                    if extra_out:
                        outs_refs[2][j] = x2
                    xv = x2
                x_scr[...] = xv

                @pl.when(ip == npairs - 1)
                def _():
                    y_ref[...] = xv
            else:
                y_ref[...] = x_ref[...] + 1.0
                if extra_out:
                    outs_refs[1][...] = jnp.zeros_like(outs_refs[1])
                    outs_refs[2][...] = jnp.zeros_like(outs_refs[2])

        def call(xx):
            args = [xx] if (one_input or not grid2d) else (
                [xx, *ws_arrs, rpb, mask, dpm])
            res = pl.pallas_call(
                kern, grid=grid, in_specs=ins, out_specs=tuple(outs),
                out_shape=tuple(oshapes), scratch_shapes=scr,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=112 * 1024 * 1024),
            )(*args)
            return res[0] if isinstance(res, (tuple, list)) else res

        def fn(xx, t):
            xx = xx + t.astype(xx.dtype)
            for _ in range(6):
                xx = call(xx)
            return xx
        return jax.jit(fn)

    for tag, kw in (
        ("v_e 1-input copy grid2d", dict(one_input=True)),
        ("v_a 17-input copy grid2d", dict()),
        ("v_b + xs/xs2 outputs", dict(extra_out=True)),
        ("v_c + scratch alloc", dict(extra_out=True, scratch=True)),
        ("v_d + staged body (skipALL-eq)",
         dict(extra_out=True, scratch=True, body=True)),
        ("v_f 1-input copy grid1d", dict(one_input=True, grid2d=False)),
    ):
        try:
            ms = timeit(mk_a(**kw), x)
            print(f"{tag:34s}: {ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{tag:34s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
