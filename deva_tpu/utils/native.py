"""ctypes bindings for the native host kernels (native/devac.cpp).

Auto-builds with g++ on first use if the shared library is missing; every
caller has a pure-Python fallback, so an unbuilt tree still works.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libdevac.so")
_SRC_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "devac.cpp")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC_PATH],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(_SRC_PATH):
        _build()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64, u8p, chp, i64p, dp = (ctypes.c_int64,
                               ctypes.POINTER(ctypes.c_uint8),
                               ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_int64),
                               ctypes.POINTER(ctypes.c_double))
    lib.rle_encode.restype = i64
    lib.rle_encode.argtypes = [u8p, i64, i64, ctypes.c_char_p, i64]
    lib.rle_decode.restype = i64
    lib.rle_decode.argtypes = [chp, i64, i64, i64, u8p]
    lib.joint_hist.restype = None
    lib.joint_hist.argtypes = [i64p, i64p, i64, i64, i64p]
    lib.mwis_solve.restype = None
    lib.mwis_solve.argtypes = [dp, u8p, i64, i64, u8p]
    _lib = lib
    return _lib


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def rle_encode(mask: np.ndarray) -> Optional[str]:
    lib = get_lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    cap = 2 * h * w + 64
    buf = ctypes.create_string_buffer(cap)
    n = lib.rle_encode(_u8p(mask), h, w, buf, cap)
    if n < 0:
        return None
    return buf.raw[:n].decode("ascii")


def rle_decode(counts: str, h: int, w: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros((h, w), np.uint8)
    s = counts.encode("ascii")
    total = lib.rle_decode(s, len(s), h, w, _u8p(out))
    if total != h * w:
        return None
    return out


def joint_hist(a: np.ndarray, b: np.ndarray, k: int) -> Optional[np.ndarray]:
    """Intersection table out[i, j] = |{a==i and b==j}|; a values < rows."""
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a.ravel(), np.int64)
    b = np.ascontiguousarray(b.ravel(), np.int64)
    rows = int(a.max()) + 1 if a.size else 1
    out = np.zeros((rows, k), np.int64)
    lib.joint_hist(a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                   b.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                   a.size, k,
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def mwis_solve(weights: np.ndarray, conflict: np.ndarray,
               budget: int = 200000) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    weights = np.ascontiguousarray(weights, np.float64)
    conflict = np.ascontiguousarray(conflict, np.uint8)
    n = weights.shape[0]
    out = np.zeros(n, np.uint8)
    lib.mwis_solve(
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        _u8p(conflict), n, budget, _u8p(out))
    return out.astype(bool)
