"""ctypes bindings for the native C++ codec.

On import: loads librle_codec.so if present (building it on first use if
a compiler is available), and registers the fast paths into
instaorder_tpu.data.rle._NATIVE. Everything degrades gracefully to the
numpy implementations when the library can't be built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, 'librle_codec.so')
_lib = None


def _build():
    try:
        subprocess.run(['make', '-C', _HERE], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load(build_if_missing=True):
    """Load (building if needed) and register the native codec.
    Returns the ctypes lib or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not (build_if_missing and _build()):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.rle_string_to_counts.restype = ctypes.c_int64
    lib.rle_string_to_counts.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    lib.rle_counts_to_string.restype = ctypes.c_int64
    lib.rle_counts_to_string.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64]
    lib.rle_decode_counts.restype = ctypes.c_int
    lib.rle_decode_counts.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.rle_encode_mask.restype = ctypes.c_int64
    lib.rle_encode_mask.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    lib.rle_from_polygon.restype = ctypes.c_int64
    lib.rle_from_polygon.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]

    _lib = lib
    _register()
    return lib


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def string_to_counts(s: bytes) -> np.ndarray:
    buf = np.empty(len(s) + 4, dtype=np.int64)
    n = _lib.rle_string_to_counts(s, len(s), _i64p(buf), buf.size)
    if n < 0:
        raise ValueError('malformed RLE string')
    return buf[:n].copy()


def decode_counts(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    out = np.empty((h, w), dtype=np.uint8)
    rc = _lib.rle_decode_counts(_i64p(counts), counts.size, h, w, _u8p(out))
    if rc != 0:
        raise ValueError(f'rle length mismatch for {h}x{w}')
    return out


def encode_mask(mask: np.ndarray) -> np.ndarray:
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = mask.shape
    buf = np.empty(h * w + 2, dtype=np.int64)
    n = _lib.rle_encode_mask(_u8p(mask), h, w, _i64p(buf), buf.size)
    if n < 0:
        raise ValueError('rle encode overflow')
    return buf[:n].copy()


def polygon_to_counts(xy: np.ndarray, h: int, w: int) -> np.ndarray:
    xy = np.ascontiguousarray(xy, dtype=np.float64)
    k = xy.size // 2
    buf = np.empty(h * w + 2, dtype=np.int64)
    n = _lib.rle_from_polygon(
        xy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), k, h, w,
        _i64p(buf), buf.size)
    if n < 0:
        raise ValueError('polygon rasterisation overflow')
    return buf[:n].copy()


def _register():
    from ..data import rle
    rle._NATIVE['string_to_counts'] = string_to_counts
    rle._NATIVE['decode_counts'] = decode_counts
    rle._NATIVE['polygon_to_counts'] = polygon_to_counts
