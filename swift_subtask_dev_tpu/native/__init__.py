"""Native (C++/OpenMP) host runtime pieces, bound via ctypes.

The reference's per-node runtime is native C (threadpool.c etc.); the TPU
framework's device path is XLA/Pallas, but the host-side bulk work —
bucketing hundreds of millions of IC particles — deserves native threads
too.  The library is compiled on first use with g++ (no pybind11 in this
environment); everything degrades gracefully to numpy if a compiler is
unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Dict, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(os.path.dirname(__file__), "bucketsort.cpp")
    try:
        with open(src, "rb") as f:
            tag = hashlib.sha1(f.read()).hexdigest()[:12]
        cache_dir = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "swift_subtask_dev_tpu")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"bucketsort_{tag}.so")
        if not os.path.exists(so_path):
            tmp = so_path + ".tmp"
            subprocess.run(
                ["g++", "-O3", "-fopenmp", "-shared", "-fPIC",
                 "-o", tmp, src],
                check=True, capture_output=True)
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
    except Exception:
        return None

    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    p = ctypes.POINTER
    lib.sst_cell_index.argtypes = [p(ctypes.c_double), i64,
                                   p(ctypes.c_double), p(i32), p(i32),
                                   p(ctypes.c_float)]
    lib.sst_slot_assign.argtypes = [p(i32), i64, i32, i32, p(i64)]
    lib.sst_slot_assign.restype = i64
    lib.sst_max_cell_count.argtypes = [p(i32), i64, i32]
    lib.sst_max_cell_count.restype = i32
    lib.sst_scatter_f32.argtypes = [p(ctypes.c_float), p(i64), i64, i32,
                                    p(ctypes.c_float)]
    lib.sst_scatter_i32.argtypes = [p(i32), p(i64), i64, i32, p(i32)]
    lib.sst_num_threads.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return _build_and_load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def bucket_fields_native(grid, pos: np.ndarray,
                         fields: Dict[str, np.ndarray]
                         ) -> Tuple[Dict[str, np.ndarray], np.ndarray,
                                    np.ndarray, int]:
    """Native equivalent of grid.cellgrid.bucket_fields (host arrays).

    Returns (fields_out, mask, off, n_overflow) as numpy arrays shaped
    (C, K[, w]).  Raises RuntimeError if the library is unavailable.
    """
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native bucketsort library unavailable")

    n = len(pos)
    C, K = grid.C, grid.K
    pos = np.ascontiguousarray(pos, np.float64)
    box = np.asarray(grid.box, np.float64)
    cdim = np.asarray(grid.cdim, np.int32)
    cell = np.empty(n, np.int32)
    off_p = np.empty((n, 3), np.float32)
    lib.sst_cell_index(_ptr(pos, ctypes.c_double), n,
                       _ptr(box, ctypes.c_double),
                       _ptr(cdim, ctypes.c_int32),
                       _ptr(cell, ctypes.c_int32),
                       _ptr(off_p, ctypes.c_float))

    slot = np.empty(n, np.int64)
    n_over = int(lib.sst_slot_assign(_ptr(cell, ctypes.c_int32), n, C, K,
                                     _ptr(slot, ctypes.c_int64)))

    def scatter(arr: np.ndarray, fill=0):
        arr = np.ascontiguousarray(arr)
        w = 1 if arr.ndim == 1 else int(np.prod(arr.shape[1:]))
        if arr.dtype == np.float32:
            out = np.full((C * K, w), fill, np.float32)
            lib.sst_scatter_f32(_ptr(arr, ctypes.c_float),
                                _ptr(slot, ctypes.c_int64), n, w,
                                _ptr(out, ctypes.c_float))
        elif arr.dtype == np.int32:
            out = np.full((C * K, w), fill, np.int32)
            lib.sst_scatter_i32(_ptr(arr, ctypes.c_int32),
                                _ptr(slot, ctypes.c_int64), n, w,
                                _ptr(out, ctypes.c_int32))
        else:
            raise TypeError(f"unsupported dtype {arr.dtype}")
        return out.reshape((C, K) + arr.shape[1:])

    out_fields = {}
    for name, arr in fields.items():
        fill = -1 if (arr.dtype == np.int32 and name == "pid") else 0
        out_fields[name] = scatter(arr, fill)
    ones = np.ones(n, np.float32)
    mask = scatter(ones)
    off_t = scatter(off_p)
    return out_fields, mask, off_t, n_over


def max_cell_count(grid, pos: np.ndarray) -> int:
    """Worst-case cell occupancy (native histogram)."""
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native bucketsort library unavailable")
    n = len(pos)
    pos = np.ascontiguousarray(pos, np.float64)
    box = np.asarray(grid.box, np.float64)
    cdim = np.asarray(grid.cdim, np.int32)
    cell = np.empty(n, np.int32)
    off = np.empty((n, 3), np.float32)
    lib.sst_cell_index(_ptr(pos, ctypes.c_double), n,
                       _ptr(box, ctypes.c_double),
                       _ptr(cdim, ctypes.c_int32),
                       _ptr(cell, ctypes.c_int32),
                       _ptr(off, ctypes.c_float))
    return int(lib.sst_max_cell_count(_ptr(cell, ctypes.c_int32), n,
                                      grid.C))
