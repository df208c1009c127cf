"""DiffUNet: the guided-diffusion UNet used by DiffPIR_DiffUNet.

The reference's `DiffPIR_DiffUNet` model kind builds deepinv's ``DiffUNet``
(ref src/models/diffpir.py:11-25), which is the OpenAI guided-diffusion
``UNetModel`` (Dhariwal & Nichol 2021) with the DiffPIR FFHQ checkpoint
(``diffusion_ffhq_10m.pt``: model_channels=128, num_res_blocks=1, attention
at ds=16, channel_mult=(1,1,2,2,4,4), num_head_channels=64, learn_sigma,
scale-shift norm).  This is a TPU-first flax reimplementation:

- NHWC internals, GroupNorm(32) + SiLU, zero-init output convs;
- attention is a batched einsum over (windows of) the full feature map at
  each attended resolution (global self-attention, as in the original);
- the torch state_dict layout of published guided-diffusion checkpoints is
  consumed by :func:`torch_diffunet_to_flax`, and the architecture
  hyper-parameters are INFERRED from the checkpoint's key shapes
  (:func:`diffunet_config_from_state_dict`) so any standard guided-diffusion
  UNet checkpoint constructs the right model without hand-set config.

Denoiser interface parity (deepinv ``DiffUNet.forward(x, sigma)``): images in
[0,1] are mapped to the diffusion's [-1,1] range, sigma is matched to the
nearest DDPM timestep via ``sqrt(1-abar_t)/sqrt(abar_t)`` (linear betas
1e-4..0.02, T=1000), and the epsilon prediction is converted to a posterior
mean x0 estimate.
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding, guided-diffusion convention: cat([cos, sin])."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResBlock(nn.Module):
    out_ch: int
    use_scale_shift_norm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, emb):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(32, epsilon=1e-5, name="in_norm")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                    name="in_conv")(h)
        e = nn.silu(emb)
        mult = 2 if self.use_scale_shift_norm else 1
        e = nn.Dense(mult * self.out_ch, dtype=self.dtype, name="emb")(e)
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(e[:, None, None, :], 2, axis=-1)
            h = nn.GroupNorm(32, epsilon=1e-5, name="out_norm")(h)
            h = h * (1.0 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + e[:, None, None, :]
            h = nn.GroupNorm(32, epsilon=1e-5, name="out_norm")(h)
            h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="out_conv")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="skip_connection")(x)
        return x + h


class AttentionBlock(nn.Module):
    num_head_channels: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = max(c // self.num_head_channels, 1)
        hd = c // heads
        y = nn.GroupNorm(32, epsilon=1e-5, name="norm")(x)
        y = y.reshape(b, h * w, c)
        # torch: qkv = Conv1d(c, 3c, 1); channel layout is (heads, 3*hd)
        # under the legacy QKVAttention split used by these checkpoints
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        qkv = qkv.reshape(b, h * w, heads, 3 * hd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / math.sqrt(math.sqrt(hd))
        attn = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="proj_out")(out)
        return x + out.reshape(b, h, w, c)


@dataclasses.dataclass(frozen=True)
class DiffUNetConfig:
    in_channels: int = 3
    out_channels: int = 6  # learn_sigma: (eps, var) stacked
    model_channels: int = 128
    num_res_blocks: int = 1
    channel_mult: Sequence[int] = (1, 1, 2, 2, 4, 4)
    attention_ds: Sequence[int] = (16,)  # downsample factors with attention
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    conv_resample: bool = True

    def __post_init__(self):
        # guided-diffusion normalizes with GroupNorm(32, C) everywhere, so
        # every channel count the mult schedule produces must divide by 32
        # (flax would raise later, deep inside the first forward)
        bad = [m * self.model_channels
               for m in self.channel_mult
               if (m * self.model_channels) % 32]
        if bad:
            raise ValueError(
                f"model_channels x channel_mult must be multiples of 32 "
                f"(GroupNorm(32) architecture); offending widths: {bad}"
            )


class DiffUNet(nn.Module):
    """Guided-diffusion UNetModel; public API is NCHW like the torch one."""

    cfg: DiffUNetConfig = DiffUNetConfig()
    dtype: Any = None

    @nn.compact
    def __call__(self, x, timesteps):
        cfg = self.cfg
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        ch0 = cfg.model_channels
        emb = timestep_embedding(timesteps, ch0)
        emb = nn.Dense(4 * ch0, dtype=self.dtype, name="time_embed_0")(emb)
        emb = nn.Dense(4 * ch0, dtype=self.dtype, name="time_embed_2")(
            nn.silu(emb)
        )

        def res(name, out_ch):
            return ResBlock(
                out_ch,
                use_scale_shift_norm=cfg.use_scale_shift_norm,
                dtype=self.dtype,
                name=f"{name}_res",
            )

        def attn(name):
            return AttentionBlock(
                cfg.num_head_channels, dtype=self.dtype, name=f"{name}_attn"
            )

        hs = []
        h = nn.Conv(ch0, (3, 3), padding="SAME", dtype=self.dtype,
                    name="input_blocks_0_conv")(x)
        hs.append(h)
        ds, block = 1, 1
        ch = ch0
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                ch = mult * ch0
                h = res(f"input_blocks_{block}_0", ch)(h, emb)
                if ds in cfg.attention_ds:
                    h = attn(f"input_blocks_{block}_1")(h)
                hs.append(h)
                block += 1
            if level != len(cfg.channel_mult) - 1:
                h = nn.Conv(ch, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype,
                            name=f"input_blocks_{block}_down")(h)
                hs.append(h)
                block += 1
                ds *= 2

        h = res("middle_block_0", ch)(h, emb)
        h = attn("middle_block_1")(h)
        h = res("middle_block_2", ch)(h, emb)

        block = 0
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                ch = mult * ch0
                h = res(f"output_blocks_{block}_0", ch)(h, emb)
                if ds in cfg.attention_ds:
                    h = attn(f"output_blocks_{block}_1")(h)
                if level and i == cfg.num_res_blocks:
                    b_, hh, ww, cc = h.shape
                    h = jax.image.resize(h, (b_, hh * 2, ww * 2, cc), "nearest")
                    h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                                name=f"output_blocks_{block}_up")(h)
                    ds //= 2
                block += 1

        h = nn.GroupNorm(32, epsilon=1e-5, name="out_norm")(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=nn.initializers.zeros,
                    name="out_conv")(nn.silu(h))
        return jnp.transpose(h, (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# DDPM schedule + the deepinv denoiser interface
# ---------------------------------------------------------------------------

def ddpm_alphas_cumprod(T: int = 1000) -> np.ndarray:
    betas = np.linspace(1e-4, 0.02, T, dtype=np.float64)
    return np.cumprod(1.0 - betas)


def diffunet_denoise(apply_fn, params, x, sigma, *, multiple: int,
                     T: int = 1000):
    """deepinv DiffUNet.forward(x, sigma) parity: denoise [0,1] images.

    Maps to the diffusion's [-1,1] range (noise std doubles), picks the
    nearest timestep by sqrt(1-abar)/sqrt(abar), scales the input onto the
    x_t manifold, predicts epsilon, and returns the x0 estimate in [0,1].

    The UNet's skip connections require H and W divisible by
    2^(len(channel_mult)-1); arbitrary eval sizes are edge-padded to the
    next ``multiple`` and the estimate cropped back (the DRUNet wrapper's
    convention, drunet.py:48-53).  ``multiple`` is required — pass
    2^(len(cfg.channel_mult)-1); a fixed default would silently reintroduce
    the skip-concat crash on deeper configs (e.g. the 6-level FFHQ UNet
    needs 32).
    """
    h, w = x.shape[-2:]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw)), mode="edge")
    abar = jnp.asarray(ddpm_alphas_cumprod(T), jnp.float32)
    reduced = jnp.sqrt(1.0 - abar) / jnp.sqrt(abar)
    t = jnp.argmin(jnp.abs(reduced - 2.0 * sigma))
    x2 = 2.0 * x - 1.0
    xt = jnp.sqrt(abar[t]) * x2
    eps = apply_fn(params, xt, jnp.full((x.shape[0],), t))[:, :3]
    x0 = (xt - jnp.sqrt(1.0 - abar[t]) * eps) / jnp.sqrt(abar[t])
    return jnp.clip((x0 + 1.0) / 2.0, 0.0, 1.0)[..., :h, :w]


# ---------------------------------------------------------------------------
# torch checkpoint interop
# ---------------------------------------------------------------------------

def diffunet_config_from_state_dict(sd) -> DiffUNetConfig:
    """Infer the UNet hyper-parameters from a guided-diffusion state_dict."""
    ch0 = sd["input_blocks.0.0.weight"].shape[0]
    in_ch = sd["input_blocks.0.0.weight"].shape[1]
    out_ch = sd["out.2.weight"].shape[0]
    # walk input_blocks: resblocks have .0.in_layers.0.weight, downsamples
    # have .0.op.weight; channel trace gives channel_mult + num_res_blocks
    n_in = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"input_blocks\.(\d+)\.", k))
    )
    mults, res_per_level, cur_run = [], None, 0
    attention_ds, ds = set(), 1
    for i in range(1, n_in):
        if f"input_blocks.{i}.0.op.weight" in sd:  # Downsample
            mults.append(sd[f"input_blocks.{i - 1}.0.out_layers.3.weight"].shape[0] // ch0)
            if res_per_level is None:
                res_per_level = cur_run
            cur_run = 0
            ds *= 2
        else:
            cur_run += 1
            if f"input_blocks.{i}.1.norm.weight" in sd:
                attention_ds.add(ds)
    mults.append(sd[f"input_blocks.{n_in - 1}.0.out_layers.3.weight"].shape[0] // ch0)
    if res_per_level is None:
        res_per_level = cur_run
    # scale-shift norm doubles the emb projection's output features
    emb_out = sd["input_blocks.1.0.emb_layers.1.weight"].shape[0]
    res_out = sd["input_blocks.1.0.out_layers.3.weight"].shape[0]
    # num_head_channels leaves no trace in the state_dict (the qkv/proj
    # shapes are head-count independent); 64 is the value every published
    # guided-diffusion checkpoint (incl. DiffPIR's ffhq_10m) uses.
    nhc = 64
    return DiffUNetConfig(
        in_channels=in_ch,
        out_channels=out_ch,
        model_channels=ch0,
        num_res_blocks=res_per_level,
        channel_mult=tuple(mults),
        attention_ds=tuple(sorted(attention_ds)),
        num_head_channels=nhc,
        use_scale_shift_norm=(emb_out == 2 * res_out),
    )


def flax_diffunet_to_torch(params: dict) -> dict:
    """Inverse of :func:`torch_diffunet_to_flax`: emit the guided-diffusion
    ``UNetModel`` state_dict layout (so locally trained stand-ins are stored
    in the exact format the reference's published ``diffusion_ffhq_10m.pt``
    uses, and :func:`diffunet_config_from_state_dict` re-infers the config).
    """
    import jax

    res_leaf_inv = {
        "in_norm": ("norm", "in_layers.0"),
        "in_conv": ("conv", "in_layers.2"),
        "emb": ("dense", "emb_layers.1"),
        "out_norm": ("norm", "out_layers.0"),
        "out_conv": ("conv", "out_layers.3"),
        "skip_connection": ("conv", "skip_connection"),
    }

    def conv_w(v):
        return np.asarray(v).transpose(3, 2, 0, 1)

    def dense_w(v, conv1d):
        v = np.asarray(v).T
        return v[:, :, None] if conv1d else v

    out: dict = {}
    modules = sorted(params.keys())
    has_attn = {m for m in modules if m.endswith("_attn")}

    for mod in modules:
        leaves = params[mod]
        if mod in ("time_embed_0", "time_embed_2"):
            t = f"time_embed.{mod[-1]}"
            out[f"{t}.weight"] = dense_w(leaves["kernel"], conv1d=False)
            out[f"{t}.bias"] = np.asarray(leaves["bias"])
        elif mod == "input_blocks_0_conv":
            out["input_blocks.0.0.weight"] = conv_w(leaves["kernel"])
            out["input_blocks.0.0.bias"] = np.asarray(leaves["bias"])
        elif mod == "out_norm":
            out["out.0.weight"] = np.asarray(leaves["scale"])
            out["out.0.bias"] = np.asarray(leaves["bias"])
        elif mod == "out_conv":
            out["out.2.weight"] = conv_w(leaves["kernel"])
            out["out.2.bias"] = np.asarray(leaves["bias"])
        elif m := re.match(r"input_blocks_(\d+)_down$", mod):
            t = f"input_blocks.{m.group(1)}.0.op"
            out[f"{t}.weight"] = conv_w(leaves["kernel"])
            out[f"{t}.bias"] = np.asarray(leaves["bias"])
        elif m := re.match(r"output_blocks_(\d+)_up$", mod):
            # Upsample sits after the resblock (+ attention when present)
            bi = m.group(1)
            sub = 2 if f"output_blocks_{bi}_1_attn" in has_attn else 1
            t = f"output_blocks.{bi}.{sub}.conv"
            out[f"{t}.weight"] = conv_w(leaves["kernel"])
            out[f"{t}.bias"] = np.asarray(leaves["bias"])
        elif m := re.match(r"((input|output)_blocks_(\d+)_(\d+)|middle_block_(\d+))_(res|attn)$", mod):
            if m.group(5) is not None:  # middle_block_{sub}
                base = f"middle_block.{m.group(5)}"
            else:
                base = f"{m.group(2)}_blocks.{m.group(3)}.{m.group(4)}"
            if m.group(6) == "res":
                for leaf, sub in leaves.items():
                    kind, tleaf = res_leaf_inv[leaf]
                    t = f"{base}.{tleaf}"
                    if kind == "conv":
                        out[f"{t}.weight"] = conv_w(sub["kernel"])
                    elif kind == "dense":
                        out[f"{t}.weight"] = dense_w(sub["kernel"], conv1d=False)
                    else:
                        out[f"{t}.weight"] = np.asarray(sub["scale"])
                    out[f"{t}.bias"] = np.asarray(sub["bias"])
            else:  # attention: norm + qkv/proj_out as Conv1d
                out[f"{base}.norm.weight"] = np.asarray(leaves["norm"]["scale"])
                out[f"{base}.norm.bias"] = np.asarray(leaves["norm"]["bias"])
                for name in ("qkv", "proj_out"):
                    out[f"{base}.{name}.weight"] = dense_w(
                        leaves[name]["kernel"], conv1d=True
                    )
                    out[f"{base}.{name}.bias"] = np.asarray(leaves[name]["bias"])
        else:
            raise ValueError(f"unmapped flax module: {mod}")
    return jax.tree_util.tree_map(lambda v: np.asarray(v, np.float32), out)


def torch_diffunet_to_flax(sd) -> dict:
    """Convert a guided-diffusion UNetModel state_dict to the flax tree."""
    params: dict = {}

    def put(path, v):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(v)

    def conv(path, name, v):
        if name == "weight":
            put(path + ["kernel"], np.asarray(v).transpose(2, 3, 1, 0))
        else:
            put(path + ["bias"], v)

    def dense(path, name, v):
        v = np.asarray(v)
        if name == "weight":
            if v.ndim == 3:  # torch Conv1d(.., 1) used as a dense layer
                v = v[:, :, 0]
            put(path + ["kernel"], v.T)
        else:
            put(path + ["bias"], v)

    def norm(path, name, v):
        put(path + ["scale" if name == "weight" else "bias"], v)

    res_leaf = {
        "in_layers.0": ("norm", "in_norm"),
        "in_layers.2": ("conv", "in_conv"),
        "emb_layers.1": ("dense", "emb"),
        "out_layers.0": ("norm", "out_norm"),
        "out_layers.3": ("conv", "out_conv"),
        "skip_connection": ("conv", "skip_connection"),
    }
    handlers = {"conv": conv, "dense": dense, "norm": norm}

    for key, v in sd.items():
        parts = key.split(".")
        name = parts[-1]
        mid = ".".join(parts[:-1])
        if mid == "time_embed.0":
            dense(["time_embed_0"], name, v)
        elif mid == "time_embed.2":
            dense(["time_embed_2"], name, v)
        elif mid == "input_blocks.0.0":
            conv(["input_blocks_0_conv"], name, v)
        elif mid == "out.0":
            norm(["out_norm"], name, v)
        elif mid == "out.2":
            conv(["out_conv"], name, v)
        elif (
            m := re.match(r"(input|output)_blocks\.(\d+)\.(\d+)\.(.+)", mid)
        ) or (m2 := re.match(r"middle_block\.(\d+)\.(.+)", mid)):
            if m:
                stack, bi, sub, rest = (
                    m.group(1), m.group(2), int(m.group(3)), m.group(4),
                )
                base = f"{stack}_blocks_{bi}_{sub}"
            else:
                sub, rest = int(m2.group(1)), m2.group(2)
                bi = None
                base = f"middle_block_{sub}"
            if rest == "op":  # Downsample conv
                conv([f"input_blocks_{bi}_down"], name, v)
            elif rest == "conv":  # Upsample conv
                conv([f"output_blocks_{bi}_up"], name, v)
            elif rest in res_leaf:
                kind, leaf = res_leaf[rest]
                handlers[kind]([f"{base}_res", leaf], name, v)
            elif rest == "norm":
                norm([f"{base}_attn", "norm"], name, v)
            elif rest == "qkv":
                dense([f"{base}_attn", "qkv"], name, v)
            elif rest == "proj_out":
                dense([f"{base}_attn", "proj_out"], name, v)
            else:
                raise ValueError(f"unmapped DiffUNet key: {key}")
        else:
            raise ValueError(f"unmapped DiffUNet key: {key}")
    return params
