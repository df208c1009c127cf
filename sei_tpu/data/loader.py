"""Host-side image IO (PIL-based; torchvision-free).

Images are decoded to float32 numpy CHW in [0,1], the layout every reference
dataset produces (e.g. ref src/datasets/div2k.py:26-31).  Channel policy per
ref src/datasets/fmd.py:10-19: drop alpha, replicate grayscale to 3.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def read_image(path: str, *, channels: int = 3) -> np.ndarray:
    """Decode an image file to float32 CHW in [0,1]."""
    with Image.open(path) as im:
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    x = arr.astype(np.float32) / 255.0
    x = np.transpose(x, (2, 0, 1))
    if channels == 3:
        if x.shape[0] == 4:
            x = x[:3]
        elif x.shape[0] == 1:
            x = np.repeat(x, 3, axis=0)
        elif x.shape[0] != 3:
            raise ValueError(f"Unexpected number of channels: {x.shape[0]}")
    return x


def write_image(path: str, x: np.ndarray):
    """Save float CHW [0,1] as 8-bit (torchvision save_image convention:
    multiply by 255, add 0.5, clamp, truncate)."""
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    x = np.asarray(x)
    if x.ndim == 4:
        x = x[0]
    arr = np.clip(x * 255.0 + 0.5, 0, 255).astype(np.uint8)
    arr = np.transpose(arr, (1, 2, 0))
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
