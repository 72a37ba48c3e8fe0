"""ctypes bridge to the native host-IO library (data/native/loader.cpp).

The reference's input pipeline rides torch DataLoader's native worker pool;
this is our equivalent: fused .npy read + transform in C++ with a pthread
pool, GIL-free, writing directly into caller-owned batch buffers.  Builds on
first use with g++ (cached .so next to the source); every entry point
degrades gracefully to the numpy implementations when the toolchain or
library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "loader.cpp")
_SO = os.path.join(_HERE, "native", "libtulip_io.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC,
                     "-lpthread"],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            lib.tulip_read_npy_range.restype = ctypes.c_int
            lib.tulip_read_npy_range.argtypes = [
                ctypes.c_char_p, ctypes.c_float, ctypes.c_float,
                ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_long, ctypes.c_long,
                ctypes.POINTER(ctypes.c_float)]
            lib.tulip_npy_shape.restype = ctypes.c_int
            lib.tulip_npy_shape.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long)]
            lib.tulip_read_npy_batch.restype = ctypes.c_int
            lib.tulip_read_npy_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_long,
                ctypes.c_long, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def npy_shape(path: str):
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_long()
    w = ctypes.c_long()
    c = ctypes.c_long()
    if lib.tulip_npy_shape(path.encode(), ctypes.byref(h), ctypes.byref(w),
                           ctypes.byref(c)) != 0:
        return None
    return int(h.value), int(w.value), int(c.value)


def read_range_map(path: str, *, scale: float = 1.0, min_r: float = -1.0,
                   max_r: float = 1.0, log1p: bool = False,
                   row_start: int = 0, row_stride: int = 0,
                   col_stride: int = 0,
                   out_shape=None) -> Optional[np.ndarray]:
    """Fused read of channel 0 with the standard transform chain; None on
    any failure (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    if out_shape is None:
        s = npy_shape(path)
        if s is None:
            return None
        h, w, _ = s
        oh = h if row_stride <= 0 else (h - row_start + row_stride - 1) // row_stride
        ow = w if col_stride <= 1 else (w + col_stride - 1) // col_stride
    else:
        oh, ow = out_shape
    out = np.empty((oh, ow), np.float32)
    rc = lib.tulip_read_npy_range(
        path.encode(), scale, min_r, max_r, int(log1p), row_start,
        row_stride, col_stride, oh, ow,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None


def read_range_batch(paths: Sequence[str], *, scale: float = 1.0,
                     min_r: float = -1.0, max_r: float = 1.0,
                     log1p: bool = False, row_start: int = 0,
                     row_stride: int = 0, col_stride: int = 0,
                     out_shape=(0, 0),
                     num_threads: int = 8) -> Optional[np.ndarray]:
    """(B, 1, H, W) batch via the pthread pool; None on any failure."""
    lib = _load()
    if lib is None:
        return None
    num_threads = max(1, min(num_threads, os.cpu_count() or 1))
    oh, ow = out_shape
    n = len(paths)
    out = np.empty((n, 1, oh, ow), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failed = lib.tulip_read_npy_batch(
        arr, n, scale, min_r, max_r, int(log1p), row_start, row_stride,
        col_stride, oh, ow,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads)
    return out if failed == 0 else None
