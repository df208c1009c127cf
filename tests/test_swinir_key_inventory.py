"""Torch-converter validation against the REAL deepinv SwinIR key inventory.

The published reference checkpoints (HF hub `jscanvic/scale-equivariant-
imaging`, loaded at ref src/training.py:34-46) are state_dicts of deepinv
v0.2.0's vendored SwinIR (instantiated at ref src/models/__init__.py:51-74).
Round 1 only round-trip-tested the converter against our own torch replica;
this file instead vendors the authoritative (name, shape) inventory of that
state_dict — derived module-by-module from the SwinIR architecture definition
(Liang et al. 2021 `network_swinir.py`, which deepinv vendors unchanged at
`deepinv/models/swinir.py`) — and asserts:

  1. `torch_swinir_to_flax` consumes EVERY key (it raises on unmapped ones),
  2. the converted tree is structurally identical (paths + shapes) to a
     freshly initialized flax SwinIR for the same config — nothing silently
     dropped, nothing left unfilled,
  3. `flax_swinir_to_torch` emits exactly the inventory's parameter keys
     (the recomputed buffers are the only difference),
  4. an unknown key fails loudly.

Inventory provenance (module -> state_dict entries), following the torch
module tree of the reference config `img_size=48, patch_size=1, in_chans=3,
embed_dim=180, depths=[6]*6, num_heads=[6]*6, window_size=8, mlp_ratio=2,
qkv_bias=True (default), ape=False (default), patch_norm=True (default),
resi_connection="1conv", upsampler in {"", "pixelshuffle"}`:

  conv_first                Conv2d(in,180,3)        weight [180,in,3,3], bias
  patch_embed.norm          LayerNorm(180)          weight/bias [180]
                            (patch_norm=True; RSTB-internal patch_embed has
                             norm_layer=None, so no params there)
  layers.{i}  (i<6)         RSTB
    .residual_group.blocks.{j} (j<6)  SwinTransformerBlock
      .norm1 / .norm2       LayerNorm(180)          weight/bias [180]
      .attn.relative_position_bias_table            [(2*8-1)^2, 6] = [225, 6]
      .attn.relative_position_index  persistent buffer [64, 64]
      .attn.qkv             Linear(180,540)         weight [540,180], bias
      .attn.proj            Linear(180,180)         weight [180,180], bias
      .mlp.fc1              Linear(180,360)         weight [360,180], bias
      .mlp.fc2              Linear(360,180)         weight [180,360], bias
      .attn_mask            persistent buffer, only on shifted (odd j)
                            blocks: [(48/8)^2, 64, 64] = [36, 64, 64]
                            (register_buffer(None) on even j -> absent)
    .conv                   Conv2d(180,180,3)       ("1conv")
  norm                      LayerNorm(180)
  conv_after_body           Conv2d(180,180,3)
  -- upsampler == "" (deblurring head):
  conv_last                 Conv2d(180,3,3)
  -- upsampler == "pixelshuffle" (SR head):
  conv_before_upsample.0    Conv2d(180,64,3)
  upsample.{2k}             Conv2d(64,256,3) per x2 stage / Conv2d(64,576,3)
                            for the x3 stage (nn.Sequential interleaves
                            PixelShuffle modules at odd indices -> even keys)
  conv_last                 Conv2d(64,3,3)

  NOT in the state_dict: `mean` (plain tensor attribute, never registered),
  `absolute_pos_embed` (ape=False).
"""

import numpy as np
import pytest

from sei_tpu.models.swinir import SwinIR
from sei_tpu.models.torch_io import (
    _SKIP,
    flax_swinir_to_torch,
    torch_swinir_to_flax,
)

EMBED = 180
HEADS = 6
WS = 8
IMG = 48
DEPTHS = [6] * 6


def deepinv_swinir_inventory(upscale=None):
    """Authoritative (name -> shape) inventory of the deepinv-SwinIR
    state_dict for the reference config (see module docstring)."""
    inv = {}

    def conv(name, cin, cout, k=3):
        inv[f"{name}.weight"] = (cout, cin, k, k)
        inv[f"{name}.bias"] = (cout,)

    def linear(name, cin, cout):
        inv[f"{name}.weight"] = (cout, cin)
        inv[f"{name}.bias"] = (cout,)

    def norm(name, c=EMBED):
        inv[f"{name}.weight"] = (c,)
        inv[f"{name}.bias"] = (c,)

    conv("conv_first", 3, EMBED)
    norm("patch_embed.norm")
    n_windows = (IMG // WS) ** 2
    for i in range(len(DEPTHS)):
        for j in range(DEPTHS[i]):
            b = f"layers.{i}.residual_group.blocks.{j}"
            norm(f"{b}.norm1")
            inv[f"{b}.attn.relative_position_bias_table"] = (
                (2 * WS - 1) ** 2,
                HEADS,
            )
            inv[f"{b}.attn.relative_position_index"] = (WS * WS, WS * WS)
            linear(f"{b}.attn.qkv", EMBED, 3 * EMBED)
            linear(f"{b}.attn.proj", EMBED, EMBED)
            norm(f"{b}.norm2")
            linear(f"{b}.mlp.fc1", EMBED, 2 * EMBED)
            linear(f"{b}.mlp.fc2", 2 * EMBED, EMBED)
            if j % 2 == 1:  # shifted block: persistent attn_mask buffer
                inv[f"{b}.attn_mask"] = (n_windows, WS * WS, WS * WS)
        conv(f"layers.{i}.conv", EMBED, EMBED)
    norm("norm")
    conv("conv_after_body", EMBED, EMBED)
    if upscale is None:
        conv("conv_last", EMBED, 3)
    else:
        conv("conv_before_upsample.0", EMBED, 64)
        stage, scale = 0, upscale
        while scale % 2 == 0:
            conv(f"upsample.{2 * stage}", 64, 64 * 4)
            scale //= 2
            stage += 1
        if scale == 3:
            conv(f"upsample.{2 * stage}", 64, 64 * 9)
        conv("conv_last", 64, 3)
    return inv


def synthetic_state_dict(inv):
    rng = np.random.default_rng(0)
    return {k: rng.standard_normal(s).astype(np.float32) for k, s in inv.items()}


def tree_shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(tree_shapes(v, prefix + (k,)))
        else:
            # works for arrays AND jax.ShapeDtypeStruct (eval_shape output)
            out["/".join(prefix + (k,))] = tuple(getattr(v, "shape", np.shape(v)))
    return out


@pytest.mark.parametrize(
    "upscale,upsampler",
    [(None, None), (2, "pixelshuffle"), (3, "pixelshuffle"), (4, "pixelshuffle")],
)
def test_converter_consumes_full_published_inventory(upscale, upsampler):
    import jax
    import jax.numpy as jnp

    inv = deepinv_swinir_inventory(upscale)
    sd = synthetic_state_dict(inv)

    converted = torch_swinir_to_flax(sd)  # raises on any unmapped key (1)

    module = SwinIR(
        img_size=IMG,
        embed_dim=EMBED,
        depths=tuple(DEPTHS),
        num_heads=(HEADS,) * 6,
        window_size=WS,
        mlp_ratio=2.0,
        upscale=upscale or 1,
        upsampler=upsampler,
    )
    # only SHAPES are compared below: eval_shape traces the init abstractly
    # (no compile, no execute) — the full-size flagship config stays exact
    # while the test drops from ~15 s to ~2 s on the 1-core box.
    init = jax.eval_shape(
        lambda k, x: module.init(k, x)["params"],
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3, IMG, IMG), jnp.float32),
    )

    got, want = tree_shapes(converted), tree_shapes(init)
    assert got == want, (
        f"converted tree != flax init tree:\n"
        f"missing from converted: {sorted(set(want) - set(got))}\n"
        f"extra in converted:     {sorted(set(got) - set(want))}\n"
        f"shape mismatches: "
        f"{[(k, got[k], want[k]) for k in set(got) & set(want) if got[k] != want[k]]}"
    )

    # (3) reverse direction reproduces exactly the param keys
    back = flax_swinir_to_torch(converted)
    buffers = {k for k in inv if any(s in k for s in _SKIP)}
    assert buffers == {
        k
        for k in inv
        if k.endswith("attn_mask") or k.endswith("relative_position_index")
    }, "_SKIP must cover exactly the recomputed buffers"
    assert set(back) == set(inv) - buffers
    for k in back:
        assert back[k].shape == inv[k], (k, back[k].shape, inv[k])
        np.testing.assert_array_equal(back[k], sd[k])


def test_unknown_key_fails_loudly():
    inv = deepinv_swinir_inventory(None)
    sd = synthetic_state_dict(inv)
    sd["layers.0.residual_group.blocks.0.attn.qkv_extra.weight"] = np.zeros(
        (1,), np.float32
    )
    with pytest.raises(ValueError, match="unmapped"):
        torch_swinir_to_flax(sd)
