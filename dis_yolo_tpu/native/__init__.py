"""ctypes bindings for the native host data-path kernels.

Builds ``libdatapath.so`` from ``datapath.cc`` with g++ on first use (cached
next to the source; rebuilt when the source is newer).  Every entry point
has a pure-Python fallback in ``dis_yolo_tpu.data``; ``available()`` tells
callers whether the native path is usable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "datapath.cc")
_LIB = os.path.join(_HERE, "libdatapath.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if (not os.path.isfile(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64 = ctypes.c_int64
        lib.fill_polygon.argtypes = [f64p, f64p, i64, u8p, i64, i64]
        lib.clear_polygon.argtypes = [f64p, f64p, i64, u8p, i64, i64]
        lib.resize_bilinear_f32.argtypes = [f32p, i64, i64, i64, f32p, i64, i64]
        lib.letterbox_f32.argtypes = [f32p, i64, i64, i64, f32p, i64, i64,
                                      i64, i64, i64, i64, ctypes.c_float]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def fill_polygon(xs, ys, h: int, w: int, out: Optional[np.ndarray] = None
                 ) -> np.ndarray:
    """Even-odd scanline fill + boundary outline (OR-ed into ``out``)."""
    lib = _load()
    assert lib is not None
    xs = np.ascontiguousarray(xs, np.float64)
    ys = np.ascontiguousarray(ys, np.float64)
    if out is None:
        out = np.zeros((h, w), np.uint8)
    lib.fill_polygon(xs, ys, len(xs), out, h, w)
    return out


def clear_polygon(xs, ys, mask: np.ndarray) -> np.ndarray:
    """Clear a hole polygon's filled region from ``mask`` (uint8, in-place)."""
    lib = _load()
    assert lib is not None
    xs = np.ascontiguousarray(xs, np.float64)
    ys = np.ascontiguousarray(ys, np.float64)
    lib.clear_polygon(xs, ys, len(xs), mask, mask.shape[0], mask.shape[1])
    return mask


def resize_bilinear_f32(src: np.ndarray, w: int, h: int) -> np.ndarray:
    """Half-pixel-center bilinear resize; src [H,W] or [H,W,C] float32."""
    lib = _load()
    assert lib is not None
    squeeze = src.ndim == 2
    if squeeze:
        src = src[:, :, None]
    src = np.ascontiguousarray(src, np.float32)
    dst = np.empty((h, w, src.shape[2]), np.float32)
    lib.resize_bilinear_f32(src, src.shape[0], src.shape[1], src.shape[2],
                            dst, h, w)
    return dst[:, :, 0] if squeeze else dst


def letterbox_f32(src: np.ndarray, net_h: int, net_w: int, new_h: int,
                  new_w: int, dy: int, dx: int, pad_value: float) -> np.ndarray:
    lib = _load()
    assert lib is not None
    squeeze = src.ndim == 2
    if squeeze:
        src = src[:, :, None]
    src = np.ascontiguousarray(src, np.float32)
    dst = np.empty((net_h, net_w, src.shape[2]), np.float32)
    lib.letterbox_f32(src, src.shape[0], src.shape[1], src.shape[2], dst,
                      net_h, net_w, new_h, new_w, dy, dx, pad_value)
    return dst[:, :, 0] if squeeze else dst
