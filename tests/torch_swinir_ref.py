"""Independent torch implementation of SwinIR for golden-testing the flax port.

Written from the architecture description (Liang et al. 2021: windowed MSA
with relative position bias, shifted windows, LN->MSA->LN->MLP blocks, RSTB
conv residuals, pixelshuffle SR head).  Used ONLY in tests: converted flax
weights must produce the same outputs.  Any convention bug (kernel layout,
window order, mask construction, normalization) shows up as a mismatch.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def rel_pos_index(ws):
    coords = torch.stack(
        torch.meshgrid(torch.arange(ws), torch.arange(ws), indexing="ij")
    ).flatten(1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.permute(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).long()


class WindowAttention(nn.Module):
    def __init__(self, dim, ws, heads):
        super().__init__()
        self.ws, self.heads = ws, heads
        self.qkv = nn.Linear(dim, 3 * dim, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * ws - 1) ** 2, heads)
        )
        self.register_buffer("rpi", rel_pos_index(ws), persistent=False)

    def forward(self, x, mask):
        b_, n, c = x.shape
        h = self.heads
        hd = c // h
        qkv = self.qkv(x).reshape(b_, n, 3, h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * hd**-0.5
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[self.rpi.view(-1)]
        bias = bias.view(n, n, h).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, h, n, n) + mask[None, :, None]
            attn = attn.view(b_, h, n, n)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(out)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


def window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(win, ws, h, w):
    b = win.shape[0] // ((h // ws) * (w // ws))
    x = win.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def attn_mask_for(h, w, ws, shift):
    img = torch.zeros(1, h, w, 1)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, vs, :] = cnt
            cnt += 1
    win = window_partition(img, ws).view(-1, ws * ws)
    diff = win.unsqueeze(1) - win.unsqueeze(2)
    return diff.masked_fill(diff != 0, -100.0).masked_fill(diff == 0, 0.0)


class Block(nn.Module):
    def __init__(self, dim, heads, ws, shift, mlp_ratio):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(dim, ws, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x, hw):
        h, w = hw
        b, L, c = x.shape
        shift = self.shift if min(h, w) > self.ws else 0
        shortcut = x
        y = self.norm1(x).view(b, h, w, c)
        if shift:
            y = torch.roll(y, (-shift, -shift), dims=(1, 2))
        win = window_partition(y, self.ws)
        mask = attn_mask_for(h, w, self.ws, shift) if shift else None
        win = self.attn(win, mask)
        y = window_reverse(win, self.ws, h, w)
        if shift:
            y = torch.roll(y, (shift, shift), dims=(1, 2))
        x = shortcut + y.view(b, L, c)
        return x + self.mlp(self.norm2(x))


class RSTB(nn.Module):
    def __init__(self, dim, depth, heads, ws, mlp_ratio):
        super().__init__()

        class Group(nn.Module):
            def __init__(self):
                super().__init__()
                self.blocks = nn.ModuleList(
                    Block(dim, heads, ws, 0 if i % 2 == 0 else ws // 2, mlp_ratio)
                    for i in range(depth)
                )

        self.residual_group = Group()
        self.conv = nn.Conv2d(dim, dim, 3, 1, 1)

    def forward(self, x, hw):
        res = x
        for blk in self.residual_group.blocks:
            x = blk(x, hw)
        h, w = hw
        b, L, c = x.shape
        img = x.transpose(1, 2).view(b, c, h, w)
        img = self.conv(img)
        x = img.flatten(2).transpose(1, 2)
        return x + res


class TorchSwinIR(nn.Module):
    RGB_MEAN = (0.4488, 0.4371, 0.4040)

    def __init__(self, dim=60, depths=(2, 2), heads=(2, 2), ws=8, mlp_ratio=2.0,
                 upscale=1, upsampler=None, num_feat=64):
        super().__init__()
        self.ws = ws
        self.upscale = upscale
        self.upsampler = upsampler
        self.conv_first = nn.Conv2d(3, dim, 3, 1, 1)
        self.patch_embed_norm = nn.LayerNorm(dim)
        self.layers = nn.ModuleList(
            RSTB(dim, d, h, ws, mlp_ratio) for d, h in zip(depths, heads)
        )
        self.norm = nn.LayerNorm(dim)
        self.conv_after_body = nn.Conv2d(dim, dim, 3, 1, 1)
        if upsampler == "pixelshuffle":
            self.conv_before_upsample = nn.Conv2d(dim, num_feat, 3, 1, 1)
            ups = []
            s = upscale
            while s % 2 == 0 and s > 1:
                ups.append(nn.Conv2d(num_feat, 4 * num_feat, 3, 1, 1))
                s //= 2
            if s == 3:
                ups.append(nn.Conv2d(num_feat, 9 * num_feat, 3, 1, 1))
            self.upsample = nn.ModuleList(ups)
            self.conv_last = nn.Conv2d(num_feat, 3, 3, 1, 1)
        else:
            self.conv_last = nn.Conv2d(dim, 3, 3, 1, 1)

    def features(self, x):
        b, c, h, w = x.shape
        f = x.flatten(2).transpose(1, 2)
        f = self.patch_embed_norm(f)
        for layer in self.layers:
            f = layer(f, (h, w))
        f = self.norm(f)
        return f.transpose(1, 2).view(b, c, h, w)

    def forward(self, x):
        h_in, w_in = x.shape[2:]
        ph = (self.ws - h_in % self.ws) % self.ws
        pw = (self.ws - w_in % self.ws) % self.ws
        if ph or pw:
            x = F.pad(x, (0, pw, 0, ph), mode="reflect")
        mean = torch.tensor(self.RGB_MEAN).view(1, 3, 1, 1)
        x = x - mean
        if self.upsampler == "pixelshuffle":
            feat = self.conv_first(x)
            feat = self.conv_after_body(self.features(feat)) + feat
            feat = F.leaky_relu(self.conv_before_upsample(feat), 0.01)
            for conv in self.upsample:
                feat = conv(feat)
                r = int(math.sqrt(feat.shape[1] // 64))
                feat = F.pixel_shuffle(feat, r)
            out = self.conv_last(feat)
        else:
            feat = self.conv_first(x)
            res = self.conv_after_body(self.features(feat)) + feat
            out = x + self.conv_last(res)
        out = out + mean
        return out[:, :, : h_in * self.upscale, : w_in * self.upscale]


def load_flax_params(model: TorchSwinIR, flax_params):
    """Load a flax SwinIR params tree into this torch model."""
    import jax

    flat = {
        ".".join(p.key for p in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(flax_params)[0]
    }

    def conv_t(name):
        return torch.from_numpy(flat[name + ".kernel"].transpose(3, 2, 0, 1).copy())

    sd = {}
    for tname, fname in [
        ("conv_first", "conv_first"),
        ("conv_after_body", "conv_after_body"),
        ("conv_last", "conv_last"),
    ]:
        sd[f"{tname}.weight"] = conv_t(fname)
        sd[f"{tname}.bias"] = torch.from_numpy(flat[fname + ".bias"])
    sd["patch_embed_norm.weight"] = torch.from_numpy(flat["patch_embed_norm.scale"])
    sd["patch_embed_norm.bias"] = torch.from_numpy(flat["patch_embed_norm.bias"])
    sd["norm.weight"] = torch.from_numpy(flat["norm.scale"])
    sd["norm.bias"] = torch.from_numpy(flat["norm.bias"])
    if model.upsampler == "pixelshuffle":
        sd["conv_before_upsample.weight"] = conv_t("conv_before_upsample_0")
        sd["conv_before_upsample.bias"] = torch.from_numpy(
            flat["conv_before_upsample_0.bias"]
        )
        for i in range(len(model.upsample)):
            sd[f"upsample.{i}.weight"] = conv_t(f"upsample_{i}")
            sd[f"upsample.{i}.bias"] = torch.from_numpy(flat[f"upsample_{i}.bias"])
    li = 0
    while f"layers_{li}.conv.kernel" in flat:
        base = f"layers_{li}"
        sd[f"layers.{li}.conv.weight"] = conv_t(f"{base}.conv")
        sd[f"layers.{li}.conv.bias"] = torch.from_numpy(flat[f"{base}.conv.bias"])
        bj = 0
        while f"{base}.blocks_{bj}.norm1.scale" in flat:
            tb = f"layers.{li}.residual_group.blocks.{bj}"
            fb = f"{base}.blocks_{bj}"
            for nrm in ("norm1", "norm2"):
                sd[f"{tb}.{nrm}.weight"] = torch.from_numpy(flat[f"{fb}.{nrm}.scale"])
                sd[f"{tb}.{nrm}.bias"] = torch.from_numpy(flat[f"{fb}.{nrm}.bias"])
            sd[f"{tb}.attn.qkv.weight"] = torch.from_numpy(
                flat[f"{fb}.attn.qkv.kernel"].T.copy()
            )
            sd[f"{tb}.attn.qkv.bias"] = torch.from_numpy(flat[f"{fb}.attn.qkv.bias"])
            sd[f"{tb}.attn.proj.weight"] = torch.from_numpy(
                flat[f"{fb}.attn.proj.kernel"].T.copy()
            )
            sd[f"{tb}.attn.proj.bias"] = torch.from_numpy(flat[f"{fb}.attn.proj.bias"])
            sd[f"{tb}.attn.relative_position_bias_table"] = torch.from_numpy(
                flat[f"{fb}.attn.relative_position_bias_table"]
            )
            for fc in ("fc1", "fc2"):
                sd[f"{tb}.mlp.{fc}.weight"] = torch.from_numpy(
                    flat[f"{fb}.mlp.{fc}.kernel"].T.copy()
                )
                sd[f"{tb}.mlp.{fc}.bias"] = torch.from_numpy(
                    flat[f"{fb}.mlp.{fc}.bias"]
                )
            bj += 1
        li += 1
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    # rpi buffers are regenerated, not loaded
    assert all("rpi" in m for m in missing), missing
    return model
