"""ctypes loader for the native C++ SAH BVH builder (native/bvh_builder.cpp).

The native library is optional: ``build`` returns None when it is missing
or fails to load, and ``ops.bvh.build_bvh`` falls back to the NumPy
builder (the reference implementation). Layout contract is identical —
see the C++ header comment. Build the library with ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional, Tuple

import numpy as np

_lock = threading.Lock()
_lib = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        path = os.path.join(
            os.path.dirname(__file__), "..", "..", "native",
            "libptpu_native.so",
        )
        try:
            lib = ctypes.CDLL(os.path.abspath(path))
            lib.ptpu_build_bvh.restype = ctypes.c_int
            lib.ptpu_build_bvh.argtypes = [
                ctypes.POINTER(ctypes.c_float),   # v0
                ctypes.POINTER(ctypes.c_float),   # e1
                ctypes.POINTER(ctypes.c_float),   # e2
                ctypes.c_int64,                   # n
                ctypes.c_int32,                   # leaf_size
                ctypes.c_int32,                   # sah_bins
                ctypes.POINTER(ctypes.c_float),   # node_min
                ctypes.POINTER(ctypes.c_float),   # node_max
                ctypes.POINTER(ctypes.c_int32),   # node_meta
                ctypes.POINTER(ctypes.c_int64),   # perm
                ctypes.POINTER(ctypes.c_int64),   # out_node_count
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def build(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
          leaf_size: int, sah_bins: int
          ) -> Optional[Tuple[Tuple[np.ndarray, np.ndarray, np.ndarray],
                              np.ndarray]]:
    lib = _load()
    if lib is None:
        return None

    n = int(v0.shape[0])
    cap = 2 * max(n, 1)
    v0c = np.ascontiguousarray(v0, np.float32)
    e1c = np.ascontiguousarray(e1, np.float32)
    e2c = np.ascontiguousarray(e2, np.float32)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    node_meta = np.empty((cap, 3), np.int32)
    perm = np.empty(n, np.int64)
    count = ctypes.c_int64(0)

    def ptr(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty))

    rc = lib.ptpu_build_bvh(
        ptr(v0c, ctypes.c_float), ptr(e1c, ctypes.c_float),
        ptr(e2c, ctypes.c_float), n, leaf_size, sah_bins,
        ptr(node_min, ctypes.c_float), ptr(node_max, ctypes.c_float),
        ptr(node_meta, ctypes.c_int32), ptr(perm, ctypes.c_int64),
        ctypes.byref(count),
    )
    if rc != 0:
        return None
    m = count.value
    return (
        (node_min[:m].copy(), node_max[:m].copy(), node_meta[:m].copy()),
        perm,
    )
