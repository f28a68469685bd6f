"""ctypes loader for the native preprocessing library (``native/``).

Compiled on first use with g++ (no pip/pybind11 in this environment); the
.so is cached next to the source. Falls back cleanly: callers catch
ImportError/OSError and use the numpy paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "native")
_SO = os.path.join(_SRC_DIR, "libadaqp_native.so")
_CC = os.path.join(_SRC_DIR, "adaqp_native.cc")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_CC):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _CC, "-o", _SO],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(_SO)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    lib.build_csr.argtypes = [ctypes.c_int64, ctypes.c_int64, i32p, i32p, i64p, i32p]
    lib.bfs_order.argtypes = [ctypes.c_int64, i64p, i32p, i64p]
    lib.ldg_partition.argtypes = [
        ctypes.c_int64, i64p, i32p, i64p, ctypes.c_int32, ctypes.c_double, i32p,
    ]
    _lib = lib
    return lib


def build_csr(src: np.ndarray, dst: np.ndarray, n: int):
    lib = _load()
    e = len(src)
    indptr = np.zeros(n + 1, np.int64)
    indices = np.zeros(e, np.int32)
    lib.build_csr(n, e, np.ascontiguousarray(src, np.int32),
                  np.ascontiguousarray(dst, np.int32), indptr, indices)
    return indptr, indices


def ldg_partition(src: np.ndarray, dst: np.ndarray, n: int, k: int, slack: float = 1.05):
    lib = _load()
    indptr, indices = build_csr(src, dst, n)
    order = np.zeros(n, np.int64)
    lib.bfs_order(n, indptr, indices, order)
    part = np.zeros(n, np.int32)
    lib.ldg_partition(n, indptr, indices, order, k, slack, part)
    return part
