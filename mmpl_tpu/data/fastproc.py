"""ctypes loader for the native frame-preprocessing kernel (_fastproc.c).

The reference's per-frame PIL/torchvision chain (wan_dataset.py:64-110)
is the data path's CPU hot spot; `scale_crop_normalize_clip` fuses
max-scale resize + center crop + [-1,1] normalise + HWC->CHW for a whole
clip in one C call.  Built on first use with the system compiler
(cc -O3 -shared — no pybind11 in this image) and cached next to the
source; callers fall back to the PIL path when no compiler is available
(`fastproc.available()`).

Resampling matches PIL visually, not bit-for-bit: bilinear half-pixel
centers on upscale, box/area averaging on downscale (PIL uses triangle
filters).  Training-data preprocessing tolerates this (the reference
itself mixes torchvision and PIL filters at :64-80).

Measured honestly (21x720p -> 480x832 on this 1-core host): this scalar C
runs ~0.84 s vs PIL's SIMD resampling at ~0.2-0.5 s — PIL wins, so
`TextVideoDataset(use_native=...)` defaults to the PIL path and this
module serves PIL-free deployments (and as the seed for a SIMD port).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(os.path.dirname(__file__), "_fastproc.c")
    so = os.path.join(os.path.dirname(__file__), "_fastproc.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            cc = os.environ.get("CC", "cc")
            cmd = [cc, "-O3", "-march=native", "-shared", "-fPIC", src,
                   "-o", so, "-lm"]
            proc = subprocess.run(cmd, capture_output=True)
            if proc.returncode != 0:
                # retry without -march=native (portable build)
                cmd.remove("-march=native")
                proc = subprocess.run(cmd, capture_output=True)
                if proc.returncode != 0:
                    print(f"fastproc build failed: {proc.stderr[-300:]}",
                          file=sys.stderr)
                    return None
        lib = ctypes.CDLL(so)
        fn = lib.scale_crop_normalize_clip
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                       ctypes.c_int, ctypes.c_int,
                       ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                       ctypes.c_int]
        return lib
    except Exception as e:  # pragma: no cover - toolchain-specific
        print(f"fastproc unavailable: {e}", file=sys.stderr)
        return None


def _get() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if not _tried:
        with _lock:
            if not _tried:
                _lib = _build_and_load()
                _tried = True
    return _lib


def available() -> bool:
    return _get() is not None


def scale_crop_normalize_clip(frames: np.ndarray, height: int,
                              width: int) -> np.ndarray:
    """uint8 [T, H, W, 3] -> float32 [T, 3, height, width] in [-1, 1]."""
    lib = _get()
    assert lib is not None, "native fastproc not available"
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    T, H, W, C = frames.shape
    assert C == 3, frames.shape
    out = np.empty((T, 3, height, width), np.float32)
    rc = lib.scale_crop_normalize_clip(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        T, H, W,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height, width)
    assert rc == 0, rc
    return out
