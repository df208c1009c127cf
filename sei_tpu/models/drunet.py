"""DRUNet denoiser (Zhang et al., DPIR) in flax.

The reference's PnP / DiffPIR / DPS baselines consume a pretrained DRUNet
through deepinv (ref src/models/pnp.py:11-53, diffpir.py:11-45, dps.py:9-21).
Architecture: input = image concat a constant noise-level map; head 3x3 conv
(no bias); 3 encoder scales of [4 residual blocks + 2x2-stride downsample
conv]; 4-resblock body; decoder with transposed-conv upsamples and additive
skips; tail 3x3 conv.  All convs bias-free; ReLU activations.

Torch weight layout (drunet_color.pth) converts mechanically:
  m_head.weight -> head.kernel ; m_down{i}.{j}.res.{0,2}.weight ;
  m_down{i}.4.weight (downsample) ; m_body.{j}.res.* ; m_up{i}.0.weight
  (ConvTranspose) ; m_up{i}.{j}.res.* ; m_tail.weight.
"""

from __future__ import annotations

import re
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ResBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding="SAME", use_bias=False, name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), padding="SAME", use_bias=False, name="conv2")(h)
        return x + h


class DRUNet(nn.Module):
    in_chans: int = 3
    out_chans: int = 3
    channels: Sequence[int] = (64, 128, 256, 512)
    nb: int = 4  # res blocks per stage

    @nn.compact
    def __call__(self, x, sigma):
        """x: (B, C, H, W) in [0,1]; sigma: scalar noise level in [0,1]."""
        b, c, h, w = x.shape
        # pad to a multiple of 8 (3 downsamples)
        ph = (8 - h % 8) % 8
        pw = (8 - w % 8) % 8
        x = jnp.transpose(x, (0, 2, 3, 1))
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        noise_map = jnp.full(x.shape[:-1] + (1,), sigma, dtype=x.dtype)
        x = jnp.concatenate([x, noise_map], axis=-1)

        chs = self.channels
        x = nn.Conv(chs[0], (3, 3), padding="SAME", use_bias=False, name="head")(x)

        skips = [x]
        for i in range(len(chs) - 1):
            for j in range(self.nb):
                x = ResBlock(chs[i], name=f"down{i}_res{j}")(x)
            x = nn.Conv(
                chs[i + 1], (2, 2), strides=(2, 2), padding="VALID",
                use_bias=False, name=f"down{i}_conv",
            )(x)
            skips.append(x)

        for j in range(self.nb):
            x = ResBlock(chs[-1], name=f"body_res{j}")(x)

        for i in reversed(range(len(chs) - 1)):
            x = x + skips[i + 1] if x.shape == skips[i + 1].shape else x
            x = nn.ConvTranspose(
                chs[i], (2, 2), strides=(2, 2), padding="VALID",
                use_bias=False, name=f"up{i}_conv",
            )(x)
            for j in range(self.nb):
                x = ResBlock(chs[i], name=f"up{i}_res{j}")(x)

        x = x + skips[0] if x.shape == skips[0].shape else x
        x = nn.Conv(self.out_chans, (3, 3), padding="SAME", use_bias=False,
                    name="tail")(x)
        if ph or pw:
            x = x[:, : x.shape[1] - ph, : x.shape[2] - pw, :]
        return jnp.transpose(x, (0, 3, 1, 2))


def torch_drunet_to_flax(sd: dict) -> dict:
    """Convert a torch drunet .pth state_dict to this module's params."""
    params: dict = {}

    def put(path, v):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v

    def conv_w(v, transpose=False):
        v = np.asarray(v)
        if transpose:  # torch ConvTranspose IOHW -> flax HWIO
            return v.transpose(2, 3, 0, 1)
        return v.transpose(2, 3, 1, 0)

    for k, v in sd.items():
        if not k.endswith(".weight"):
            continue
        m = re.match(r"m_head\.weight", k)
        if m:
            put(["head", "kernel"], conv_w(v))
            continue
        m = re.match(r"m_tail\.weight", k)
        if m:
            put(["tail", "kernel"], conv_w(v))
            continue
        m = re.match(r"m_(down|up|body)(\d*)\.(\d+)\.res\.(0|2)\.weight", k)
        if m:
            kind, stage, block, which = m.groups()
            leaf = "conv1" if which == "0" else "conv2"
            bi = int(block)
            if kind == "up":
                bi -= 1  # torch m_up{i}.0 is the ConvTranspose
            name = "body_res" + str(bi) if kind == "body" else f"{kind}{stage}_res{bi}"
            put([name, leaf, "kernel"], conv_w(v))
            continue
        m = re.match(r"m_down(\d+)\.(\d+)\.weight", k)
        if m:
            put([f"down{m.group(1)}_conv", "kernel"], conv_w(v))
            continue
        m = re.match(r"m_up(\d+)\.0\.weight", k)
        if m:
            put([f"up{m.group(1)}_conv", "kernel"], conv_w(v, transpose=True))
            continue
        raise ValueError(f"unmapped DRUNet key: {k}")
    return params


# -- native weight format (no-egress environments train DRUNet locally) -----


def save_drunet_native(path, params, *, channels, nb):
    """Flax params -> one .npz (keys are /-joined tree paths + config)."""
    import numpy as _np

    flat = {}
    for kpath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(getattr(k, "key", str(k)) for k in kpath)
        flat[key] = _np.asarray(leaf)
    _np.savez(path, __channels=_np.asarray(channels),
              __nb=_np.asarray(nb), **flat)


def load_drunet_native(path):
    """Returns (params, DRUNet module) from :func:`save_drunet_native`."""
    import numpy as _np

    z = _np.load(path)
    channels = tuple(int(c) for c in z["__channels"])
    nb = int(z["__nb"])
    params = {}
    for key in z.files:
        if key.startswith("__"):
            continue
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(z[key])
    return params, DRUNet(channels=channels, nb=nb)
