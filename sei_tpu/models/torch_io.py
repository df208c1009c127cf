"""Torch checkpoint interop: read/write SwinIR & ConvUNet weights.

The reference publishes trained weights as torch ``state_dict`` files on the
HuggingFace hub (ref src/training.py:34-46, checkpoint dicts with a
``params`` key from ref src/training.py:6-31).  For parity evaluation we must
load those files; torch (CPU) is used purely as a pickle reader - no torch op
ever runs in the compute path.

Key mapping (torch SwinIR -> flax SwinIR in models/swinir.py):
  conv_first.weight (OIHW)              -> conv_first.kernel (HWIO)
  patch_embed.norm.{weight,bias}        -> patch_embed_norm.{scale,bias}
  layers.{i}.residual_group.blocks.{j}. -> layers_{i}.blocks_{j}.
      norm1/norm2.{weight,bias}         ->   norm1/norm2.{scale,bias}
      attn.qkv.weight (3C,C)            ->   attn.qkv.kernel (C,3C)
      attn.proj.*                       ->   attn.proj.*
      attn.relative_position_bias_table ->   attn.relative_position_bias_table
      mlp.fc{1,2}.*                     ->   mlp.fc{1,2}.*
  layers.{i}.conv.*                     -> layers_{i}.conv.*        (1conv)
  norm.{weight,bias}                    -> norm.{scale,bias}
  conv_after_body.*                     -> conv_after_body.*
  conv_before_upsample.0.*              -> conv_before_upsample_0.*
  upsample.{0,2,...}.*                  -> upsample_{0,1,...}.*
  conv_last.*                           -> conv_last.*
  (attn_mask / relative_position_index buffers are recomputed, not loaded)
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt/.pth file into {key: np.ndarray}; unwraps 'params'."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "params" in obj and isinstance(obj["params"], dict):
        obj = obj["params"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def _set(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_SKIP = ("attn_mask", "relative_position_index", "absolute_pos_embed")


def torch_swinir_to_flax(sd: Dict[str, np.ndarray]) -> dict:
    """Convert a torch SwinIR state_dict to a flax params tree."""
    params: dict = {}
    ps_re = re.compile(
        r"layers\.(\d+)\.residual_group\.blocks\.(\d+)\.(.+)"
    )
    for key, val in sd.items():
        if any(s in key for s in _SKIP):
            continue
        v = np.asarray(val)

        def conv(name_parts, v=v, key=key):
            # torch conv OIHW -> flax HWIO
            if key.endswith(".weight") and v.ndim == 4:
                _set(params, name_parts + ["kernel"], v.transpose(2, 3, 1, 0))
            elif key.endswith(".weight"):
                raise ValueError(f"unexpected conv weight rank for {key}")
            else:
                _set(params, name_parts + ["bias"], v)

        def dense(name_parts, v=v, key=key):
            if key.endswith(".weight"):
                _set(params, name_parts + ["kernel"], v.T)
            else:
                _set(params, name_parts + ["bias"], v)

        def norm(name_parts, v=v, key=key):
            leaf = "scale" if key.endswith(".weight") else "bias"
            _set(params, name_parts + [leaf], v)

        m = ps_re.match(key)
        if m:
            li, bj, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            base = [f"layers_{li}", f"blocks_{bj}"]
            if rest.startswith("norm1."):
                norm(base + ["norm1"])
            elif rest.startswith("norm2."):
                norm(base + ["norm2"])
            elif rest == "attn.relative_position_bias_table":
                _set(params, base + ["attn", "relative_position_bias_table"], v)
            elif rest.startswith("attn.qkv."):
                dense(base + ["attn", "qkv"])
            elif rest.startswith("attn.proj."):
                dense(base + ["attn", "proj"])
            elif rest.startswith("mlp.fc1."):
                dense(base + ["mlp", "fc1"])
            elif rest.startswith("mlp.fc2."):
                dense(base + ["mlp", "fc2"])
            else:
                raise ValueError(f"unmapped SwinIR key: {key}")
            continue

        m = re.match(r"layers\.(\d+)\.conv\.(weight|bias)", key)
        if m:
            conv([f"layers_{int(m.group(1))}", "conv"])
            continue
        m = re.match(r"layers\.(\d+)\.conv\.(\d+)\.(weight|bias)", key)
        if m:  # 3conv residual connection
            conv([f"layers_{int(m.group(1))}", f"conv_{m.group(2)}"])
            continue

        if key.startswith("patch_embed.norm."):
            norm(["patch_embed_norm"])
        elif key.startswith("norm."):
            norm(["norm"])
        elif key.startswith("conv_first."):
            conv(["conv_first"])
        elif key.startswith("conv_after_body."):
            conv(["conv_after_body"])
        elif key.startswith("conv_before_upsample.0."):
            conv(["conv_before_upsample_0"])
        elif key.startswith("conv_last."):
            conv(["conv_last"])
        elif key.startswith("upsample."):
            m = re.match(r"upsample\.(\d+)\.(weight|bias)", key)
            stage = int(m.group(1)) // 2  # torch Sequential skips PixelShuffle slots
            conv([f"upsample_{stage}"])
        else:
            raise ValueError(f"unmapped SwinIR key: {key}")
    return params


def _module_to_torch_name(mod: str) -> str:
    """Map a flax module path (dot-joined) to the torch module name."""
    m = re.match(r"layers_(\d+)\.blocks_(\d+)\.(.*)", mod)
    if m:
        return f"layers.{m.group(1)}.residual_group.blocks.{m.group(2)}.{m.group(3)}"
    m = re.match(r"layers_(\d+)\.conv(?:_(\d+))?$", mod)
    if m:
        suffix = f".{m.group(2)}" if m.group(2) else ""
        return f"layers.{m.group(1)}.conv{suffix}"
    if mod == "patch_embed_norm":
        return "patch_embed.norm"
    if mod == "conv_before_upsample_0":
        return "conv_before_upsample.0"
    m = re.match(r"upsample_(\d+)$", mod)
    if m:
        return f"upsample.{2 * int(m.group(1))}"
    return mod


def flax_swinir_to_torch(params: dict) -> Dict[str, np.ndarray]:
    """Inverse of :func:`torch_swinir_to_flax` (for reference-compatible saves)."""
    import jax

    out: Dict[str, np.ndarray] = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, v in flat:
        parts = [p.key for p in path]
        mod = ".".join(parts[:-1])
        leaf = parts[-1]
        tname = _module_to_torch_name(mod)
        v = np.asarray(v)
        if leaf == "kernel" and v.ndim == 4:
            out[f"{tname}.weight"] = v.transpose(3, 2, 0, 1)
        elif leaf == "kernel":
            out[f"{tname}.weight"] = v.T
        elif leaf == "scale":
            out[f"{tname}.weight"] = v
        elif leaf == "bias":
            out[f"{tname}.bias"] = v
        elif leaf == "relative_position_bias_table":
            out[f"{tname}.relative_position_bias_table"] = v
        else:
            raise ValueError(f"unmapped flax leaf: {mod}.{leaf}")
    return out


def save_torch_state(path: str, state: Dict[str, Any]):
    """Write a torch-loadable checkpoint (the reference's on-disk format)."""
    import torch

    def conv(v):
        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items()}
        if isinstance(v, np.ndarray):
            return torch.from_numpy(np.array(v, copy=True))
        return v

    torch.save(conv(state), path)
