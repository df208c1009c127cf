"""Checkpoint / weights I/O: orbax native format + torch interop.

Parity with ref src/training.py:
  * training state = {epoch, params, optimizer, scheduler-equivalent};
    written at epoch 0, every checkpoint_interval, and at the end, with
    zero-padded names ``ckp_%0Nd`` (ref demo/train.py:232-243,292-295).
  * ``get_weights(name)``: local file, else the published HuggingFace weights
    ``jscanvic/scale-equivariant-imaging/{name}.pt`` (requires egress);
    torch files are read via models/torch_io and converted.
  * final ``weights.pt`` is written in BOTH the native orbax format
    (weights.orbax) and, for SwinIR, a reference-compatible torch file.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..models.torch_io import load_torch_file

HF_URL = "https://huggingface.co/jscanvic/scale-equivariant-imaging/resolve/main/{name}.pt?download=true"


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """Async orbax checkpointing of {epoch, params, opt_state}."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def save(self, epoch: int, max_epoch: int, state: dict):
        width = len(str(max_epoch))
        path = os.path.join(self.directory, f"ckp_{epoch:0{width}d}")
        self._ckpt.save(path, _to_numpy_tree(state), force=True)
        return path

    def restore(self, path: str, template: Optional[dict] = None) -> dict:
        if template is not None:
            return self._ckpt.restore(path, template)
        return self._ckpt.restore(path)

    def wait(self):
        self._ckpt.wait_until_finished()


def latest_checkpoint(directory: str) -> Optional[str]:
    """Newest NUMBERED checkpoint (ckp_best is a validation-selected
    snapshot, not the resume point)."""
    if not os.path.isdir(directory):
        return None
    entries = sorted(
        e
        for e in os.listdir(directory)
        if e.startswith("ckp_") and e[4:].isdigit()
    )
    return os.path.join(directory, entries[-1]) if entries else None


def get_weights(name_or_path: str, *, cache_dir: str = "./weights"):
    """Resolve a weights name to a params source (ref src/training.py:34-46).

    Returns either a flax params tree (orbax dir) or a torch state_dict
    (flat {key: ndarray}); Model.load_weights accepts both.
    """
    if os.path.isdir(name_or_path):  # orbax checkpoint directory
        return ocp.StandardCheckpointer().restore(os.path.abspath(name_or_path))
    if os.path.exists(name_or_path):  # torch .pt file
        return load_torch_file(name_or_path)
    # HuggingFace hub fallback (requires network egress)
    os.makedirs(cache_dir, exist_ok=True)
    dest = os.path.join(cache_dir, f"{name_or_path}.pt")
    if not os.path.exists(dest):
        import urllib.request

        urllib.request.urlretrieve(HF_URL.format(name=name_or_path), dest)
    return load_torch_file(dest)
