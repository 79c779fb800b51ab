"""Loader for the native (C++) NVDB ingestion core.

Builds native/nvdb_core.cpp lazily with g++ (cached next to the source) and
binds it via ctypes. Every entry point has a pure-numpy fallback in
grids/nvdb.py, so the framework works without a toolchain; with it, leaf
scatter runs at memory bandwidth.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "nvdb_core.cpp",
)
_SO = os.path.join(os.path.dirname(_SRC), "libnvdb_core.so")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            src_mtime = os.path.getmtime(_SRC)
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < src_mtime:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", _SO, _SRC],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_SO)
            lib.vpt_fill_leaves.restype = ctypes.c_int64
            lib.vpt_fill_leaves.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ]
            lib.vpt_extract_leaves.restype = ctypes.c_int64
            lib.vpt_extract_leaves.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def fill_leaves(leaf_bytes: np.ndarray, leaf_stride: int, dense: np.ndarray, lo) -> bool:
    """Scatter leaves (raw [n_leaf, stride] u8) into dense; False if no lib."""
    lib = _load()
    if lib is None:
        return False
    assert dense.dtype == np.float32 and dense.flags.c_contiguous
    assert leaf_bytes.flags.c_contiguous
    n_leaf = leaf_bytes.shape[0]
    lib.vpt_fill_leaves(
        leaf_bytes.ctypes.data, leaf_stride, n_leaf,
        dense.ctypes.data, *dense.shape, int(lo[0]), int(lo[1]), int(lo[2]),
    )
    return True


def extract_leaves(dense: np.ndarray, lo):
    """Nonzero 8^3 blocks of dense -> (origins [M,3] i32, values [M,512] f32),
    or None when the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    dense = np.ascontiguousarray(dense, np.float32)
    X, Y, Z = dense.shape
    max_blocks = ((X + 15) // 8) * ((Y + 15) // 8) * ((Z + 15) // 8)
    origins = np.empty((max_blocks, 3), np.int32)
    values = np.empty((max_blocks, 512), np.float32)
    count = lib.vpt_extract_leaves(
        dense.ctypes.data, X, Y, Z, int(lo[0]), int(lo[1]), int(lo[2]),
        origins.ctypes.data, values.ctypes.data, max_blocks,
    )
    if count < 0:
        return None
    return origins[:count], values[:count].reshape(count, 8, 8, 8)
