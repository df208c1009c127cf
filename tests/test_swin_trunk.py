"""Golden tests for the fused Pallas Swin trunk (ops/swin_trunk.py).

Three layers of evidence:
  1. trunk_reference == the unfused flax SwinBlock stack (same params),
  2. the Pallas kernel (interpret mode, runs on CPU) == trunk_reference,
  3. kernel custom-VJP grads == jax.grad through trunk_reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sei_tpu.models.swinir import (
    SwinBlock,
    relative_position_index,
    shift_attn_mask,
)
from sei_tpu.ops.swin_trunk import (
    PARAM_LEAVES,
    swin_trunk,
    trunk_reference,
)

# D=2 is the smallest depth that exercises both shift kinds AND the
# cross-block carry; interpret-mode walltime scales linearly in D, and the
# deeper-stack behavior is covered by the flax golden tests (test_swinir_*)
D, B, H, W, C, NH, WS = 2, 2, 8, 8, 16, 2, 4
CH = 2 * C
N = WS * WS


def _flax_blocks(key):
    """Build D flax SwinBlocks; return (param list, apply fn)."""
    blocks, params = [], []
    for d in range(D):
        blk = SwinBlock(dim=C, num_heads=NH, window_size=WS,
                        shift_size=0 if d % 2 == 0 else WS // 2,
                        mlp_ratio=2.0, drop_path=0.0)
        key, k = jax.random.split(key)
        p = blk.init(k, jnp.zeros((B, H, W, C)), True)["params"]
        blocks.append(blk)
        params.append(p)

    def apply(x):
        for blk, p in zip(blocks, params):
            x = blk.apply({"params": p}, x, True)
        return x

    return blocks, params, apply


def _stack_params(flax_params):
    """flax SwinBlock params -> the swin_trunk stacked layout + rpb."""
    out = {k: [] for k in PARAM_LEAVES}
    rpb = []
    idx = relative_position_index(WS).reshape(-1)
    onehot = np.zeros((N * N, (2 * WS - 1) ** 2), np.float32)
    onehot[np.arange(N * N), idx] = 1.0
    for p in flax_params:
        out["ln1_s"].append(p["norm1"]["scale"])
        out["ln1_b"].append(p["norm1"]["bias"])
        out["qkv_w"].append(p["attn"]["qkv"]["kernel"])
        out["qkv_b"].append(p["attn"]["qkv"]["bias"])
        out["proj_w"].append(p["attn"]["proj"]["kernel"])
        out["proj_b"].append(p["attn"]["proj"]["bias"])
        out["ln2_s"].append(p["norm2"]["scale"])
        out["ln2_b"].append(p["norm2"]["bias"])
        out["fc1_w"].append(p["mlp"]["fc1"]["kernel"])
        out["fc1_b"].append(p["mlp"]["fc1"]["bias"])
        out["fc2_w"].append(p["mlp"]["fc2"]["kernel"])
        out["fc2_b"].append(p["mlp"]["fc2"]["bias"])
        table = np.asarray(p["attn"]["relative_position_bias_table"],
                           np.float32)
        b = (onehot @ table).reshape(N, N, NH).transpose(2, 0, 1)
        rpb.append(b)
    params = {k: jnp.stack([jnp.asarray(v) for v in vs])
              for k, vs in out.items()}
    return params, jnp.asarray(np.stack(rpb))


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    _, flax_params, flax_apply = _flax_blocks(key)
    params, rpb = _stack_params(flax_params)
    mask = shift_attn_mask(H, W, WS, WS // 2)
    dpm = jnp.ones((D, 2, B), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C), jnp.float32)
    return x, params, rpb, mask, dpm, flax_apply


def test_reference_matches_flax(setup):
    x, params, rpb, mask, dpm, flax_apply = setup
    got = trunk_reference(x, params, rpb, mask, dpm,
                          num_heads=NH, window_size=WS)
    want = flax_apply(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_kernel_matches_reference(setup):
    x, params, rpb, mask, dpm, flax_apply = setup
    got = swin_trunk(x, params, rpb, mask, dpm,
                     num_heads=NH, window_size=WS,
                     use_pallas=True, interpret=True)
    want = trunk_reference(x, params, rpb, mask, dpm,
                           num_heads=NH, window_size=WS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_kernel_grads_match_reference(setup):
    x, params, rpb, mask, dpm, flax_apply = setup
    # one image: halves the interpret-mode grid walk; multi-image coverage
    # lives in test_kernel_multi_image_groups
    x, dpm = x[:1], dpm[:, :, :1]
    tgt = jax.random.normal(jax.random.PRNGKey(2), x.shape, jnp.float32)

    def loss_k(x, params, rpb):
        y = swin_trunk(x, params, rpb, mask, dpm, num_heads=NH,
                       window_size=WS, use_pallas=True, interpret=True)
        return jnp.mean((y - tgt) ** 2)

    def loss_r(x, params, rpb):
        y = trunk_reference(x, params, rpb, mask, dpm,
                            num_heads=NH, window_size=WS)
        return jnp.mean((y - tgt) ** 2)

    # jitted: the reference path's op-by-op dispatch dominates wall time on
    # the 1-core box; under jit it compiles once into the persistent cache
    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))(x, params, rpb)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(x, params, rpb)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_kernel_bf16_full_saves_mode(setup):
    """bf16 inputs take the save-carrying forward + saved-tensor backward
    (mode="full"); f32 takes the recompute backward (mode="xs").  The bf16
    kernel must match the bf16 reference: outputs tightly (same math, saved
    tensors are exact casts of what the fwd computed), grads loosely (the
    backward consumes bf16-stored p/gelu' where the reference recomputes
    them in f32 - perturbations at bf16 resolution)."""
    x, params, rpb, mask, dpm, _ = setup
    x, dpm = x[:1], dpm[:, :, :1]  # one image (see grads test note)
    xb = x.astype(jnp.bfloat16)
    got = swin_trunk(xb, params, rpb, mask, dpm, num_heads=NH,
                     window_size=WS, use_pallas=True, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = trunk_reference(xb, params, rpb, mask, dpm,
                           num_heads=NH, window_size=WS)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=5e-2)

    tgt = jax.random.normal(jax.random.PRNGKey(2), x.shape, jnp.float32)

    def loss(fn):
        def f(params, rpb):
            y = fn(xb, params, rpb, mask, dpm,
                   num_heads=NH, window_size=WS)
            return jnp.mean((y.astype(jnp.float32) - tgt) ** 2)
        return f

    gk = jax.jit(jax.grad(loss(lambda *a, **kw: swin_trunk(
        *a, use_pallas=True, interpret=True, **kw)), argnums=(0, 1)))(
            params, rpb)
    gr = jax.jit(jax.grad(loss(trunk_reference), argnums=(0, 1)))(params, rpb)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-2)

    # primal (save-free, eval) and vjp-forward (save-carrying) agree
    y_vjp, _ = jax.vjp(
        lambda xx: swin_trunk(xx, params, rpb, mask, dpm, num_heads=NH,
                              window_size=WS, use_pallas=True,
                              interpret=True), xb)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(y_vjp, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_kernel_multi_image_groups(setup, monkeypatch):
    """G>1 (multiple images per grid step) == G=1 == reference."""
    x, params, rpb, mask, dpm, _ = setup
    want = trunk_reference(x, params, rpb, mask, dpm,
                           num_heads=NH, window_size=WS)
    for g in (1, 2):
        monkeypatch.setenv("SEI_TRUNK_G", str(g))
        got = swin_trunk(x, params, rpb, mask, dpm,
                         num_heads=NH, window_size=WS,
                         use_pallas=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_kernel_heads_per_tile_variants(setup, monkeypatch):
    """SEI_TRUNK_HPT (the attention-packing probe knob) is numerically
    inert: capping heads-per-tile at 1 (exact per-head tiles) or 2 must
    reproduce the default greedy packing, forward AND grads."""
    from sei_tpu.ops.swin_trunk import _head_tiling

    x, params, rpb, mask, dpm, _ = setup
    x, dpm = x[:1], dpm[:, :, :1]
    want = trunk_reference(x, params, rpb, mask, dpm,
                           num_heads=NH, window_size=WS)
    tgt = jax.random.normal(jax.random.PRNGKey(3), x.shape, jnp.float32)

    def loss(xx, pp):
        y = swin_trunk(xx, pp, rpb, mask, dpm, num_heads=NH,
                       window_size=WS, use_pallas=True, interpret=True)
        return jnp.mean((y - tgt) ** 2)

    monkeypatch.setenv("SEI_TRUNK_HPT", "1")
    assert len(_head_tiling(NH, C // NH)) == NH  # really one head per tile
    got = swin_trunk(x, params, rpb, mask, dpm, num_heads=NH,
                     window_size=WS, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    g1 = jax.grad(loss, argnums=(0, 1))(x, params)
    monkeypatch.delenv("SEI_TRUNK_HPT")
    g0 = jax.grad(loss, argnums=(0, 1))(x, params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_per_branch_drop_path_masks(setup):
    """dpm axis 1 = (attn, mlp) masks act on DIFFERENT residual branches:
    zeroing one branch must differ from zeroing the other (the reference's
    DropPath draws independently per call)."""
    x, params, rpb, mask, _, _ = setup
    base = np.ones((D, 2, B), np.float32)
    attn_off = base.copy(); attn_off[:, 0] = 0.0
    mlp_off = base.copy(); mlp_off[:, 1] = 0.0
    run = lambda m: np.asarray(trunk_reference(
        x, params, rpb, mask, jnp.asarray(m), num_heads=NH, window_size=WS))
    ya, ym = run(attn_off), run(mlp_off)
    assert not np.allclose(ya, ym)
    # and the kernel honors the same per-branch semantics
    ka = np.asarray(swin_trunk(x, params, rpb, mask, jnp.asarray(attn_off),
                               num_heads=NH, window_size=WS,
                               use_pallas=True, interpret=True))
    np.testing.assert_allclose(ka, ya, rtol=2e-5, atol=2e-5)


def test_kernel_multi_lane_tile_heads():
    """Heads spanning >1 lane tile (the flagship's C=180/nh=6 case) take the
    per-tile packed-attention path; verify kernel==reference==flax with
    C=160, nh=2 (hd=80 -> greedy tiling puts each head in its own tile),
    including grads."""
    c, nh, d, b, h = 160, 2, 2, 1, 8
    ws = 4

    from sei_tpu.ops.swin_trunk import _head_tiling

    assert len(_head_tiling(nh, c // nh)) == 2  # really multi-tile

    blocks, params_list = [], []
    key = jax.random.PRNGKey(7)
    for i in range(d):
        blk = SwinBlock(dim=c, num_heads=nh, window_size=ws,
                        shift_size=0 if i % 2 == 0 else ws // 2,
                        mlp_ratio=2.0, drop_path=0.0)
        key, k = jax.random.split(key)
        params_list.append(blk.init(k, jnp.zeros((b, h, h, c)), True)["params"])
        blocks.append(blk)

    def flax_apply(x):
        for blk, p in zip(blocks, params_list):
            x = blk.apply({"params": p}, x, True)
        return x

    n = ws * ws
    idx = relative_position_index(ws).reshape(-1)
    onehot = np.zeros((n * n, (2 * ws - 1) ** 2), np.float32)
    onehot[np.arange(n * n), idx] = 1.0
    stacked = {k: [] for k in PARAM_LEAVES}
    rpb = []
    for p in params_list:
        stacked["ln1_s"].append(p["norm1"]["scale"])
        stacked["ln1_b"].append(p["norm1"]["bias"])
        stacked["qkv_w"].append(p["attn"]["qkv"]["kernel"])
        stacked["qkv_b"].append(p["attn"]["qkv"]["bias"])
        stacked["proj_w"].append(p["attn"]["proj"]["kernel"])
        stacked["proj_b"].append(p["attn"]["proj"]["bias"])
        stacked["ln2_s"].append(p["norm2"]["scale"])
        stacked["ln2_b"].append(p["norm2"]["bias"])
        stacked["fc1_w"].append(p["mlp"]["fc1"]["kernel"])
        stacked["fc1_b"].append(p["mlp"]["fc1"]["bias"])
        stacked["fc2_w"].append(p["mlp"]["fc2"]["kernel"])
        stacked["fc2_b"].append(p["mlp"]["fc2"]["bias"])
        table = np.asarray(p["attn"]["relative_position_bias_table"], np.float32)
        rpb.append((onehot @ table).reshape(n, n, nh).transpose(2, 0, 1))
    params = {k: jnp.stack([jnp.asarray(v) for v in vs])
              for k, vs in stacked.items()}
    rpb = jnp.asarray(np.stack(rpb))
    mask = shift_attn_mask(h, h, ws, ws // 2)
    dpm = jnp.ones((d, 2, b), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(8), (b, h, h, c), jnp.float32)

    want = flax_apply(x)
    got = swin_trunk(x, params, rpb, mask, dpm, num_heads=nh, window_size=ws,
                     use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)

    tgt = jax.random.normal(jax.random.PRNGKey(9), x.shape, jnp.float32)

    def loss_k(params):
        y = swin_trunk(x, params, rpb, mask, dpm, num_heads=nh,
                       window_size=ws, use_pallas=True, interpret=True)
        return jnp.mean((y - tgt) ** 2)

    def loss_r(params):
        y = trunk_reference(x, params, rpb, mask, dpm,
                            num_heads=nh, window_size=ws)
        return jnp.mean((y - tgt) ** 2)

    gk = jax.jit(jax.grad(loss_k))(params)
    gr = jax.jit(jax.grad(loss_r))(params)
    for a, b_ in zip(jax.tree_util.tree_leaves(gk),
                     jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-5)


def test_kernel_no_shift_small_image(setup):
    """min(H, W) <= ws disables all shifts (flax parity)."""
    _, params, rpb, _, dpm, _ = setup
    x = jax.random.normal(jax.random.PRNGKey(3), (B, WS, WS, C), jnp.float32)
    got = swin_trunk(x, params, rpb, None, dpm, num_heads=NH,
                     window_size=WS, use_pallas=True, interpret=True)
    want = trunk_reference(x, params, rpb, None, dpm,
                           num_heads=NH, window_size=WS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


class TestModelIntegration:
    """Fused-trunk SwinIR == unfused SwinIR (same params, f32)."""

    def _models(self):
        from sei_tpu.models.swinir import SwinIR

        cfg = dict(img_size=8, embed_dim=16, depths=(2,), num_heads=(2,),
                   window_size=4, mlp_ratio=2.0, drop_path_rate=0.0,
                   upsampler=None)
        unfused = SwinIR(fused_trunk=False, **cfg)
        fused = SwinIR(fused_trunk=True, **cfg)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 8, 8))
        params = unfused.init(jax.random.PRNGKey(1), x, True)["params"]
        return unfused, fused, params, x

    def test_forward_match(self):
        unfused, fused, params, x = self._models()
        a = unfused.apply({"params": params}, x, True)
        b = fused.apply({"params": params}, x, True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    def test_grads_match(self):
        unfused, fused, params, x = self._models()
        x = x[:1]  # one image: halves the interpret-mode grid walk
        tgt = jax.random.uniform(jax.random.PRNGKey(2), x.shape)

        def loss(model):
            def f(p):
                y = model.apply({"params": p}, x, True)
                return jnp.mean((y - tgt) ** 2)
            # jitted: compiles once into the persistent cache instead of
            # paying op-by-op dispatch on the 1-core box
            return jax.jit(jax.grad(f))(params)

        ga, gb = loss(unfused), loss(fused)
        for a, b in zip(jax.tree_util.tree_leaves(ga),
                        jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-6)

    def test_dropout_path_runs(self):
        """drop_path>0 in train mode exercises the dpm rng plumbing."""
        from sei_tpu.models.swinir import SwinIR

        cfg = dict(img_size=8, embed_dim=16, depths=(2,), num_heads=(2,),
                   window_size=4, mlp_ratio=2.0, drop_path_rate=0.2,
                   upsampler=None)
        fused = SwinIR(fused_trunk=True, **cfg)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 8, 8))
        params = fused.init(jax.random.PRNGKey(1), x, True)["params"]
        y = fused.apply({"params": params}, x, False,
                        rngs={"dropout": jax.random.PRNGKey(3)})
        assert np.isfinite(np.asarray(y)).all()


def test_fused_trunk_under_mesh_interpret(monkeypatch):
    """The PRODUCTION composition - fused Pallas trunk (interpret mode on
    CPU) inside a jitted, batch-sharded train step over the 8-device mesh -
    compiles, executes, and matches the unfused model's loss/grads.

    Covers VERDICT item: the default-on kernel had never executed under a
    mesh (the CPU dryrun falls back to pure JAX without this env knob)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sei_tpu.models.swinir import SwinIR
    from sei_tpu.parallel import make_mesh, batch_sharding, replicate

    monkeypatch.setenv("SEI_TRUNK_INTERPRET", "1")
    mesh = make_mesh()
    assert mesh.devices.size == 8
    cfg = dict(img_size=8, embed_dim=16, depths=(2,), num_heads=(2,),
               window_size=4, mlp_ratio=2.0, drop_path_rate=0.0,
               upsampler=None)
    fused = SwinIR(fused_trunk=True, **cfg)
    unfused = SwinIR(fused_trunk=False, **cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (8, 3, 8, 8))
    tgt = jax.random.uniform(jax.random.PRNGKey(2), (8, 3, 8, 8))
    params = unfused.init(jax.random.PRNGKey(1), x, True)["params"]

    params_r = replicate(mesh, params)
    x_s = jax.device_put(x, batch_sharding(mesh))
    tgt_s = jax.device_put(tgt, batch_sharding(mesh))

    def make_step(model):
        @jax.jit
        def step(p, xb, tb):
            def loss(p):
                out = model.apply({"params": p}, xb, True)
                return jnp.mean((out - tb) ** 2)
            return jax.value_and_grad(loss)(p)
        return step

    loss_f, grads_f = make_step(fused)(params_r, x_s, tgt_s)
    # bf16 leg: the save-carrying "full" kernel mode (fast-gelu + fwd-saved
    # residuals) - the actual production training configuration - under the
    # same sharded step
    fused16 = SwinIR(fused_trunk=True, dtype=jnp.bfloat16, **cfg)
    loss_f16, grads_f16 = make_step(fused16)(params_r, x_s, tgt_s)
    monkeypatch.delenv("SEI_TRUNK_INTERPRET")
    loss_u, grads_u = make_step(unfused)(params_r, x_s, tgt_s)
    assert np.isclose(float(loss_f), float(loss_u), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads_f),
                    jax.tree_util.tree_leaves(grads_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-6)
    assert np.isfinite(float(loss_f16))
    assert np.isclose(float(loss_f16), float(loss_u), rtol=5e-2)
    for g16 in jax.tree_util.tree_leaves(grads_f16):
        assert np.isfinite(np.asarray(g16, np.float32)).all()
    # the loss really was computed from sharded inputs over 8 devices
    assert len(x_s.sharding.device_set) == 8


def test_pick_group_uses_lane_padded_channels():
    """VMEM group sizing must budget the (8,128)-tiled padded channel count.

    Regression: a c=16 f32 config sized with raw c picked g=8 and asked
    Mosaic for 123 MB (limit 112 MB).  The flagship picks (calibrated on
    v5e) must stay exactly as measured: bf16+saves g=1, bf16 save-free
    fwd g=2 / bwd g=1, f32 fwd g=1.
    """
    from sei_tpu.ops.swin_trunk import _pick_group

    # flagship: c=180 -> 256 padded lanes, 48px, batch 8
    assert _pick_group(8, 48, 48, 180, 2, 23, "SEI_TRUNK_G") == 1   # bf16+saves
    assert _pick_group(8, 48, 48, 180, 2, 52, "SEI_TRUNK_G") == 2   # bf16 fwd
    assert _pick_group(8, 48, 48, 180, 2, 29, "SEI_TRUNK_G_BWD") == 1
    assert _pick_group(8, 48, 48, 180, 4, 52, "SEI_TRUNK_G") == 1   # f32 fwd
    # tiny-channel config: c=16 still occupies full 128-lane tiles; the
    # group must stay small (the raw-c formula chose the whole batch, g=8)
    assert _pick_group(8, 48, 48, 16, 4, 52, "SEI_TRUNK_G") <= 2
