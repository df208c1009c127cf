"""SwinIR restoration transformer in flax (TPU-native rebuild).

Capability parity with the network the reference trains
(deepinv's vendored SwinIR, configured at ref src/models/__init__.py:51-74):
shallow 3x3 conv -> N residual Swin transformer blocks (RSTB; windowed MSA
with relative position bias, shifted windows, LN, 2-layer MLP) -> conv +
global residual -> reconstruction head (3x3 conv, or pixelshuffle upsampler
for SR).  Default config: embed_dim 180, depths [6]*6, heads [6]*6, window 8,
mlp_ratio 2, drop_path 0.1, resi_connection "1conv".

TPU-first choices:
  * NHWC everywhere (TPU conv layout); the public API stays NCHW.
  * Features keep their (B, H, W, C) spatial layout; window partition is a
    reshape/transpose, never a gather.
  * Shifted-window attention masks and relative-position indices are
    computed in numpy at trace time (shapes are static under jit), so they
    fold into the compiled graph as constants.
  * Attention softmax accumulates in f32; matmuls run on the MXU in the
    param dtype (bf16-friendly).
  * Module/parameter names mirror the torch state_dict structure so that
    published reference checkpoints convert mechanically (models/torch_io.py).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv_mm import Conv3x3

RGB_MEAN = (0.4488, 0.4371, 0.4040)


@lru_cache(maxsize=None)
def relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2ws-1)^2 relative bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    )  # (2, ws, ws)
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)  # (N, N, 2)
    rel = rel + (ws - 1)
    idx = rel[..., 0] * (2 * ws - 1) + rel[..., 1]
    return idx.astype(np.int32)


@lru_cache(maxsize=None)
def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(num_windows, N, N) additive mask (-100/0) for shifted windows."""
    img = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C) via reshape/transpose."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(win: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of :func:`window_partition`."""
    c = win.shape[-1]
    b = win.shape[0] // ((h // ws) * (w // ws))
    x = win.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


# Init parity with the reference (deepinv SwinIR `_init_weights`): every
# nn.Linear in the transformer gets trunc_normal(std=0.02) weights and zero
# bias; convs keep torch's Conv2d default kaiming_uniform(a=sqrt(5)), i.e.
# Uniform with variance 1/(3*fan_in).  flax defaults (lecun_normal) are ~4x
# wider at C=180, which measurably changes early training dynamics.
trunc02 = nn.initializers.truncated_normal(stddev=0.02)
conv_torch_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, kernel_init=trunc02,
                     name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, dtype=self.dtype, kernel_init=trunc02,
                     name="fc2")(x)
        return x


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = None
    use_pallas: Optional[bool] = None  # None = auto (on for TPU backends)

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray]):
        # x: (B_, N, C) with N = ws*ws
        b_, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = hd**-0.5

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc02, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B_, nh, N, hd)
        q = q * scale

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * self.window_size - 1) ** 2, nh),
        )
        # Bias lookup as a constant one-hot matmul instead of a gather: the
        # backward pass is then a transposed matmul on the MXU rather than a
        # serialized TPU scatter-add.
        idx = relative_position_index(self.window_size).reshape(-1)
        onehot = np.zeros((n * n, table.shape[0]), np.float32)
        onehot[np.arange(n * n), idx] = 1.0
        bias = jnp.asarray(onehot) @ table.astype(jnp.float32)  # (N*N, nh)
        bias = bias.reshape(n, n, nh).transpose(2, 0, 1)  # (nh, N, N)

        from ..ops.attention import window_attention

        out = window_attention(q, k, v, bias, mask, use_pallas=self.use_pallas)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, kernel_init=trunc02,
                        name="proj")(out)


class DropPath(nn.Module):
    """Per-sample stochastic depth on the residual branch."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool, rate_override=None):
        rate = self.rate if rate_override is None else rate_override
        if deterministic or (rate_override is None and self.rate == 0.0):
            return x
        keep = 1.0 - rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    drop_path: float
    qkv_bias: bool = True
    dtype: Any = None
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: bool, drop_path_override=None):
        # x: (B, H, W, C) with H, W multiples of window_size
        b, h, w, c = x.shape
        ws = self.window_size
        shift = self.shift_size if min(h, w) > ws else 0

        shortcut = x
        # LN in the compute dtype: params and the mean/var statistics stay
        # f32 (flax upcasts stats internally); only the normalized output is
        # cast.  Halves the LN HBM traffic in bf16 mode - the step is
        # bandwidth-bound (round-2 probes), not MXU-bound.
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        win = window_partition(y, ws)
        mask = shift_attn_mask(h, w, ws, shift) if shift > 0 else None
        win = WindowAttention(
            dim=c,
            window_size=ws,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="attn",
        )(win, mask)
        y = window_reverse(win, ws, h, w)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))

        dp = DropPath(rate=self.drop_path)
        x = shortcut + dp(y, deterministic, drop_path_override)
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        z = Mlp(hidden=int(c * self.mlp_ratio), out=c, dtype=self.dtype, name="mlp")(z)
        return x + dp(z, deterministic, drop_path_override)


class SwinPair(nn.Module):
    """One (no-shift, shift) block pair - the scan body for RSTB."""

    dim: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    qkv_bias: bool
    dtype: Any
    use_pallas: Optional[bool]
    deterministic: bool

    @nn.compact
    def __call__(self, x, rates):
        common = dict(
            dim=self.dim,
            num_heads=self.num_heads,
            window_size=self.window_size,
            mlp_ratio=self.mlp_ratio,
            drop_path=0.0,  # rate arrives via rates (scanned input)
            qkv_bias=self.qkv_bias,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
        )
        x = SwinBlock(shift_size=0, name="blocks_a", **common)(
            x, self.deterministic, drop_path_override=rates[0]
        )
        x = SwinBlock(shift_size=self.window_size // 2, name="blocks_b", **common)(
            x, self.deterministic, drop_path_override=rates[1]
        )
        return x, None


class RSTB(nn.Module):
    """Residual Swin Transformer Block: BasicLayer + conv + residual.

    ``fused_trunk`` runs all ``depth`` blocks as ONE Pallas kernel
    (ops/swin_trunk.py): activations stay in VMEM across the whole trunk,
    collapsing ~20*depth XLA ops into depth/2 fused grid steps.  Parameters
    keep the exact per-block flax structure (checkpoint/torch-interop
    unchanged); they are stacked at trace time, which XLA folds into a few
    cheap copies.  Init always takes the unfused path so the param tree is
    identical either way.

    ``scan_blocks`` folds the depth loop into one ``nn.scan`` over a
    shift/no-shift block pair: the pair's HLO compiles once instead of
    depth/2 times (a large compile-time win for the 36-block flagship).
    Parameters are then stacked (depth//2, ...) per leaf; see
    torch_io.stack_scanned_params for checkpoint interop.
    """

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    drop_paths: Sequence[float]
    qkv_bias: bool = True
    resi_connection: str = "1conv"
    dtype: Any = None
    use_pallas: Optional[bool] = None
    remat: bool = False
    scan_blocks: bool = False
    fused_trunk: bool = False

    def _fused_apply(self, x, deterministic: bool):
        """Stack the per-block params and call the fused Pallas trunk."""
        from ..ops.swin_trunk import PARAM_LEAVES, swin_trunk

        b, h, w, c = x.shape
        ws = self.window_size
        n = ws * ws
        pv = self.variables["params"]
        leaf_of = {
            "ln1_s": ("norm1", "scale"), "ln1_b": ("norm1", "bias"),
            "qkv_w": ("attn", "qkv", "kernel"), "qkv_b": ("attn", "qkv", "bias"),
            "proj_w": ("attn", "proj", "kernel"), "proj_b": ("attn", "proj", "bias"),
            "ln2_s": ("norm2", "scale"), "ln2_b": ("norm2", "bias"),
            "fc1_w": ("mlp", "fc1", "kernel"), "fc1_b": ("mlp", "fc1", "bias"),
            "fc2_w": ("mlp", "fc2", "kernel"), "fc2_b": ("mlp", "fc2", "bias"),
        }

        def get(i, path):
            node = pv[f"blocks_{i}"]
            for k in path:
                node = node[k]
            return node

        stacked = {
            leaf: jnp.stack([get(i, path) for i in range(self.depth)])
            for leaf, path in leaf_of.items()
        }
        # relative-position bias: one-hot matmul keeps the table's gradient
        # path a transposed matmul (no scatter), exactly as WindowAttention.
        idx = relative_position_index(ws).reshape(-1)
        onehot = np.zeros((n * n, (2 * ws - 1) ** 2), np.float32)
        onehot[np.arange(n * n), idx] = 1.0
        oh = jnp.asarray(onehot)
        rpb = jnp.stack([
            (oh @ get(i, ("attn", "relative_position_bias_table"))
             .astype(jnp.float32)).reshape(n, n, self.num_heads)
            .transpose(2, 0, 1)
            for i in range(self.depth)
        ])
        shift = ws // 2 if min(h, w) > ws else 0
        mask = shift_attn_mask(h, w, ws, shift) if shift > 0 else None
        rates = np.asarray(self.drop_paths, np.float32)
        if deterministic or float(rates.max()) == 0.0:
            dpm = jnp.ones((self.depth, 2, b), jnp.float32)
        else:
            # independent draw per residual branch (attn, mlp) - matching
            # the unfused DropPath's two make_rng calls per block
            keep = jnp.asarray(1.0 - rates)[:, None, None]
            bern = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (self.depth, 2, b))
            dpm = bern.astype(jnp.float32) / keep
        return swin_trunk(x, stacked, rpb, mask, dpm,
                          num_heads=self.num_heads, window_size=ws)

    @nn.compact
    def __call__(self, x, deterministic: bool):
        res = x
        if (
            self.fused_trunk
            and not self.is_initializing()
            and self.depth % 2 == 0
        ):
            x = self._fused_apply(x, deterministic)
        elif self.scan_blocks:
            assert self.depth % 2 == 0, "scan_blocks needs an even depth"
            n_pairs = self.depth // 2
            rates = jnp.asarray(self.drop_paths, jnp.float32).reshape(n_pairs, 2)
            scanned = nn.scan(
                SwinPair,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0,),
                length=n_pairs,
            )(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                deterministic=deterministic,
                name="pairs",
            )
            x, _ = scanned(x, rates)
        else:
            block_cls = (
                nn.remat(SwinBlock, static_argnums=(2,)) if self.remat else SwinBlock
            )
            for i in range(self.depth):
                x = block_cls(
                    dim=self.dim,
                    num_heads=self.num_heads,
                    window_size=self.window_size,
                    shift_size=0 if i % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=self.drop_paths[i],
                    qkv_bias=self.qkv_bias,
                    dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    name=f"blocks_{i}",
                )(x, deterministic)
        if self.resi_connection == "1conv":
            x = Conv3x3(self.dim, dtype=self.dtype, kernel_init=conv_torch_init, name="conv")(x)
        else:  # 3conv (bottleneck)
            x = Conv3x3(self.dim // 4, kernel_init=conv_torch_init, name="conv_0")(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Conv(self.dim // 4, (1, 1), kernel_init=conv_torch_init, name="conv_2")(x)
            x = nn.leaky_relu(x, 0.2)
            x = Conv3x3(self.dim, kernel_init=conv_torch_init, name="conv_4")(x)
        return x + res


def _pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch PixelShuffle in NHWC: (B,H,W,C*r^2) -> (B,H*r,W*r,C).

    torch's channel order is (C, r, r); converted weights must follow it.
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, c
    return x.reshape(b, h * r, w * r, c)


class SwinIR(nn.Module):
    """SwinIR (NCHW public API, NHWC internals).

    upsampler: None (deblurring/denoising head with global input residual)
    or "pixelshuffle" (SR head), matching the two reference modes.
    """

    img_size: int = 48
    in_chans: int = 3
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    upscale: int = 1
    img_range: float = 1.0
    upsampler: Optional[str] = None
    resi_connection: str = "1conv"
    num_feat: int = 64
    # compute dtype for matmuls/convs (params stay f32); bf16 on TPU
    dtype: Any = None
    # fused Pallas window attention (None = env-gated; see ops/attention.py)
    use_pallas: Optional[bool] = None
    # rematerialize each Swin block in backward: ~30% more flops, O(depth)
    # less activation memory (needed for batch >8 at 48px on 16GB HBM)
    remat: bool = False
    # rematerialize only the first K RSTBs: fine-grained memory/time trade
    # (the f32 proposed step at batch 8 overflows 16GB HBM by ~260MB; one
    # rematted RSTB frees ~1.9GB at ~+6% step time)
    remat_layers: int = 0
    # nn.scan over block pairs; params become stacked (convert per-block
    # trees / torch checkpoints with swinir.stack_params_for_scan).  Measured
    # on a v5e at the flagship config: compile 157s vs 106s and steady step
    # 136ms vs 80ms AGAINST the unrolled loop (XLA fuses better across
    # unrolled blocks) - keep False unless compile memory forces it.
    scan_blocks: bool = False
    # fused Pallas trunk (ops/swin_trunk.py): all blocks of an RSTB in one
    # kernel, activations resident in VMEM.  None = auto: on for TPU backends
    # at training-crop sizes (the per-image VMEM working set must fit; large
    # eval images fall back to the XLA path / spatial tiling).
    fused_trunk: Optional[bool] = None

    def _fused_trunk_on(self, h: int, w: int) -> bool:
        if self.fused_trunk is not None:
            on = self.fused_trunk
        else:
            import os

            env = os.environ.get("SEI_FUSED_TRUNK")
            if env is not None:
                on = env not in ("0", "false", "")
            else:
                # default ON for TPU backends: measured on v5e (b8, 48px,
                # bf16) the fused trunk runs the full proposed train step at
                # 55.0 img/s vs 30.9 unfused (fwd 13.6ms vs 19.0ms; the
                # remat-style custom VJP is the bigger win).  SEI_FUSED_TRUNK=0
                # opts out.
                on = jax.default_backend() in ("tpu", "axon")
        # VMEM gate: per-image tile + chunked transients; 64x64 tokens at
        # C=180 is ~1.5 MB/tile which leaves headroom on a 16 MB core.
        # qkv_bias gate: the fused kernel reads qkv_b unconditionally.
        return (
            bool(on)
            and self.qkv_bias
            and (h * w <= 64 * 64)
            and all(d % 2 == 0 for d in self.depths)
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: (B, C, H, W) in [0, 1]
        h_in, w_in = x.shape[2], x.shape[3]
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC

        ws = self.window_size
        pad_h = (ws - h_in % ws) % ws
        pad_w = (ws - w_in % ws) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")

        if self.in_chans == 3:
            mean = jnp.asarray(RGB_MEAN, dtype=x.dtype)
        else:
            mean = jnp.asarray([0.5] * self.in_chans, dtype=x.dtype)
        x = (x - mean) * self.img_range

        total_depth = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total_depth).tolist()

        def features(feat):
            if self.patch_norm:
                f = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_embed_norm")(feat)
            else:
                f = feat
            fused = self._fused_trunk_on(f.shape[1], f.shape[2])
            d0 = 0
            for li, depth in enumerate(self.depths):
                rstb_cls = (
                    nn.remat(RSTB, static_argnums=(2,))
                    if li < self.remat_layers else RSTB
                )
                f = rstb_cls(
                    dim=self.embed_dim,
                    depth=depth,
                    num_heads=self.num_heads[li],
                    window_size=ws,
                    mlp_ratio=self.mlp_ratio,
                    drop_paths=tuple(dpr[d0 : d0 + depth]),
                    qkv_bias=self.qkv_bias,
                    resi_connection=self.resi_connection,
                    dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    remat=self.remat,
                    scan_blocks=self.scan_blocks,
                    fused_trunk=fused,
                    name=f"layers_{li}",
                )(f, deterministic)
                d0 += depth
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(f)

        if self.upsampler == "pixelshuffle":
            feat = Conv3x3(self.embed_dim, dtype=self.dtype, kernel_init=conv_torch_init, name="conv_first")(x)
            res = Conv3x3(self.embed_dim, dtype=self.dtype,
                kernel_init=conv_torch_init, name="conv_after_body"
            )(features(feat))
            feat = res + feat
            feat = Conv3x3(self.num_feat, dtype=self.dtype,
                           kernel_init=conv_torch_init, name="conv_before_upsample_0")(feat)
            feat = nn.leaky_relu(feat, 0.01)
            # Upsample tower: x2 stages (+ optional x3 stage), torch order.
            scale = self.upscale
            stage = 0
            while scale % 2 == 0 and scale > 1:
                feat = Conv3x3(4 * self.num_feat, dtype=self.dtype,
                               kernel_init=conv_torch_init, name=f"upsample_{stage}")(feat)
                feat = _pixel_shuffle(feat, 2)
                scale //= 2
                stage += 1
            if scale == 3:
                feat = Conv3x3(9 * self.num_feat, dtype=self.dtype,
                               kernel_init=conv_torch_init, name=f"upsample_{stage}")(feat)
                feat = _pixel_shuffle(feat, 3)
            elif scale != 1:
                raise ValueError(f"unsupported upscale {self.upscale}")
            out = Conv3x3(self.in_chans, dtype=self.dtype, kernel_init=conv_torch_init, name="conv_last")(feat)
        else:
            feat = Conv3x3(self.embed_dim, dtype=self.dtype, kernel_init=conv_torch_init, name="conv_first")(x)
            res = Conv3x3(self.embed_dim, dtype=self.dtype,
                kernel_init=conv_torch_init, name="conv_after_body"
            )(features(feat))
            res = res + feat
            out = x + Conv3x3(self.in_chans, dtype=self.dtype, kernel_init=conv_torch_init, name="conv_last")(res)

        out = out / self.img_range + mean
        out = out[:, : h_in * self.upscale, : w_in * self.upscale, :]
        return jnp.transpose(out, (0, 3, 1, 2))


def stack_params_for_scan(params: dict) -> dict:
    """Convert a per-block SwinIR params tree to the scan_blocks layout.

    layers_i/blocks_{2j}/... -> layers_i/pairs/blocks_a/... stacked over j;
    odd blocks go to blocks_b.  Inverse of the naming the torch converter
    produces, so published checkpoints load into scan models via
    torch_swinir_to_flax + this function.
    """
    import re as _re

    out = {}
    for lname, lval in params.items():
        m = _re.match(r"layers_\d+$", lname)
        if not m:
            out[lname] = lval
            continue
        new_layer = {}
        a_blocks, b_blocks = [], []
        for bname in sorted(
            (k for k in lval if k.startswith("blocks_")),
            key=lambda k: int(k.split("_")[1]),
        ):
            bi = int(bname.split("_")[1])
            (a_blocks if bi % 2 == 0 else b_blocks).append(lval[bname])
        for k, v in lval.items():
            if not k.startswith("blocks_"):
                new_layer[k] = v

        def stack(trees):
            return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)

        new_layer["pairs"] = {
            "blocks_a": stack(a_blocks),
            "blocks_b": stack(b_blocks),
        }
        out[lname] = new_layer
    return out
