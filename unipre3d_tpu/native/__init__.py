"""Native host kernels (C++/OpenMP) with numpy fallbacks.

The input pipeline's hot host-side ops — FPS capping, voxel-grid dedup,
kNN — are implemented in C++ (src/host_ops.cpp), the TPU-pipeline
counterpart of the reference's vendored CUDA/C++ extensions
(openpoints/cpp/*, SURVEY.md §2.7). The library is compiled on first
use with the system g++ (cached beside the source); if compilation is
unavailable the numpy fallbacks keep everything functional.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "host_ops.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "src", "libhost_ops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # retry without OpenMP
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.fps.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        lib.grid_subsample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.grid_subsample.restype = ctypes.c_int
        lib.knn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def host_fps(xyz: np.ndarray, m: int) -> np.ndarray:
    """FPS indices [m] for xyz [n, 3] float32 (seed index 0)."""
    xyz = np.ascontiguousarray(xyz[:, :3], dtype=np.float32)
    n = len(xyz)
    m = min(m, n)
    lib = _load()
    out = np.empty(m, dtype=np.int32)
    if lib is not None:
        lib.fps(_fptr(xyz), n, m, _iptr(out))
        return out
    # numpy fallback (O(n*m))
    min_d2 = np.full(n, np.inf, dtype=np.float32)
    cur = 0
    out[0] = 0
    for i in range(1, m):
        d2 = np.sum((xyz - xyz[cur]) ** 2, axis=1)
        np.minimum(min_d2, d2, out=min_d2)
        cur = int(np.argmax(min_d2))
        out[i] = cur
    return out


def host_grid_subsample(xyz: np.ndarray, grid_size: float,
                        min_coord: np.ndarray = None):
    """First-point-per-voxel dedup. Returns (kept_idx [k], grid [k, 3])."""
    xyz = np.ascontiguousarray(xyz[:, :3], dtype=np.float32)
    n = len(xyz)
    if min_coord is None:
        min_coord = xyz.min(axis=0)
    min_coord = np.ascontiguousarray(min_coord, dtype=np.float32)
    lib = _load()
    if lib is not None:
        out_idx = np.empty(n, dtype=np.int32)
        out_grid = np.empty((n, 3), dtype=np.int32)
        k = lib.grid_subsample(_fptr(xyz), n, float(grid_size),
                               _fptr(min_coord), _iptr(out_idx),
                               _iptr(out_grid))
        return out_idx[:k].copy(), out_grid[:k].copy()
    grid = np.floor((xyz - min_coord) / grid_size).astype(np.int64)
    key = (grid[:, 0] << 42) | (grid[:, 1] << 21) | grid[:, 2]
    _, keep = np.unique(key, return_index=True)
    keep.sort()
    return keep.astype(np.int32), grid[keep].astype(np.int32)


def host_knn(query: np.ndarray, support: np.ndarray, k: int):
    """Brute-force kNN. Returns (idx [nq, k], d2 [nq, k]) ascending."""
    query = np.ascontiguousarray(query[:, :3], dtype=np.float32)
    support = np.ascontiguousarray(support[:, :3], dtype=np.float32)
    nq, ns = len(query), len(support)
    k = min(k, ns)
    lib = _load()
    if lib is not None:
        idx = np.empty((nq, k), dtype=np.int32)
        d2 = np.empty((nq, k), dtype=np.float32)
        lib.knn(_fptr(query), nq, _fptr(support), ns, k, _iptr(idx),
                _fptr(d2))
        return idx, d2
    d2_full = (np.sum(query ** 2, 1)[:, None] + np.sum(support ** 2, 1)
               - 2 * query @ support.T)
    idx = np.argpartition(d2_full, k - 1, axis=1)[:, :k]
    part = np.take_along_axis(d2_full, idx, axis=1)
    order = np.argsort(part, axis=1)
    idx = np.take_along_axis(idx, order, axis=1).astype(np.int32)
    return idx, np.take_along_axis(part, order, axis=1).astype(np.float32)
