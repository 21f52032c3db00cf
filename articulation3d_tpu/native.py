"""ctypes loader for the native host library (native/libarti3d.so).

Provides the C++ fast paths — ear-clipping triangulation and COCO RLE
encode/decode — with automatic build-on-first-use and graceful fallback to
the pure-numpy implementations when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libarti3d.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.arti3d_earcut.restype = ctypes.c_int
        lib.arti3d_earcut.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.arti3d_rle_encode.restype = ctypes.c_int
        lib.arti3d_rle_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32)]
        lib.arti3d_rle_decode.restype = None
        lib.arti3d_rle_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def have_native() -> bool:
    return _load() is not None


def earcut(verts: np.ndarray) -> Optional[np.ndarray]:
    """(N, 2) polygon -> (M, 3) triangle indices, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, np.float32)
    n = v.shape[0]
    if n < 3:
        return np.zeros((0, 3), np.int32)
    out = np.zeros(3 * (n - 2), np.int32)
    m = lib.arti3d_earcut(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out[:3 * m].reshape(-1, 3)


def rle_encode_counts(mask: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask, np.uint8)
    h, w = m.shape
    counts = np.zeros(h * w + 1, np.uint32)
    n = lib.arti3d_rle_encode(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return counts[:n].astype(np.int64)


def rle_decode_counts(counts: np.ndarray, h: int, w: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    c = np.ascontiguousarray(counts, np.uint32)
    mask = np.zeros((h, w), np.uint8)
    lib.arti3d_rle_decode(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(c), h, w,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return mask
