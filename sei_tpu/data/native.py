"""ctypes bindings for the native C++ loader (csrc/sei_loader.cc).

Parallel PNG decode + bicubic-antialias shorter-side resize in C++ threads,
replacing the reference's per-item torchvision ingest.  Falls back to the
PIL + numpy path transparently when the shared library hasn't been built
(``make -C csrc``) or at import failure.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libsei_loader.so")
_lib = None


def _load_lib(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        csrc = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
        try:
            subprocess.run(["make", "-C", csrc], check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sei_png_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.sei_png_dims.restype = ctypes.c_int
    lib.sei_load_png.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    lib.sei_load_png.restype = ctypes.c_int
    lib.sei_load_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.sei_load_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


def load_png_batch(
    paths: Sequence[str], *, size: Optional[int] = None, n_threads: int = 8
) -> list[np.ndarray]:
    """Decode + resize a batch of PNGs in parallel C++ threads.

    Returns a list of float32 CHW arrays (shorter side == size when given).
    Raises RuntimeError if the native lib is unavailable or any file fails.
    """
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native loader not built (make -C csrc)")
    n = len(paths)
    sz = size if size else -1
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    for i, p in enumerate(paths):
        h = ctypes.c_int()
        w = ctypes.c_int()
        if lib.sei_png_dims(p.encode(), sz, ctypes.byref(h), ctypes.byref(w)) != 0:
            raise RuntimeError(f"failed to probe {p}")
        hs[i], ws[i] = h.value, w.value

    offsets = (ctypes.c_int64 * n)()
    total = 0
    for i in range(n):
        offsets[i] = total
        total += 3 * hs[i] * ws[i]
    buf = np.empty(total, dtype=np.float32)
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    failures = lib.sei_load_batch(
        blob, offsets, hs, ws, n, sz,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    if failures:
        raise RuntimeError(f"{failures} images failed to load")
    out = []
    for i in range(n):
        o = offsets[i]
        out.append(buf[o : o + 3 * hs[i] * ws[i]].reshape(3, hs[i], ws[i]))
    return out
