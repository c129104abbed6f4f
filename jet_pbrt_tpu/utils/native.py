"""ctypes bridge to the optional C++ runtime (native/libjetpbrt.so).

The reference implements its whole runtime in C++; here the hot *device*
path is JAX/XLA, and the native library accelerates the hot *host* paths:
OBJ parsing and BVH construction. Everything degrades gracefully to the
numpy implementations when the library hasn't been built
(`make -C native`).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "libjetpbrt.so")
    path = os.path.abspath(path)
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.jp_obj_count.restype = ctypes.c_longlong
            lib.jp_obj_count.argtypes = [ctypes.c_char_p]
            lib.jp_obj_load.restype = ctypes.c_longlong
            lib.jp_obj_load.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_longlong,
            ]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def try_load_obj_native(path: str):
    """Returns (tris [T,3,3], uvs [T,3,2]) or None if no native lib."""
    lib = _lib()
    if lib is None:
        return None
    n = lib.jp_obj_count(path.encode())
    if n < 0:
        return None
    tris = np.zeros((n, 3, 3), np.float32)
    uvs = np.zeros((n, 3, 2), np.float32)
    got = lib.jp_obj_load(
        path.encode(),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        uvs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
    )
    if got != n:
        return None
    return tris, uvs


def native_available() -> bool:
    return _lib() is not None
