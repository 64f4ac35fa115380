"""ctypes binding to the C++ labeling solver (native/solver.cpp).

The reference's only native dependency on the data path was Concorde (C)
[SURVEY §2.1]; this is its in-repo replacement.  Build with `make -C native`
(produces native/libtspsolver.so).  Falls back gracefully when unbuilt —
`solver.solve` then uses the NumPy local search.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libtspsolver.so"),
]
_lib: Optional[ctypes.CDLL] = None
_checked = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
                lib.tsp_solve.restype = ctypes.c_double
                lib.tsp_solve.argtypes = [
                    ctypes.POINTER(ctypes.c_double),  # dist matrix [n*n]
                    ctypes.c_int,                     # n
                    ctypes.c_int,                     # restarts
                    ctypes.c_uint64,                  # rng seed
                    ctypes.POINTER(ctypes.c_int),     # out tour [n]
                ]
                lib.tsp_held_karp.restype = ctypes.c_double
                lib.tsp_held_karp.argtypes = [
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_int),
                ]
                _lib = lib
            except OSError:
                _lib = None
            break
    return _lib


def available() -> bool:
    return _load() is not None


def solve(dist: np.ndarray, restarts: int = 4,
          seed: int = 0) -> Tuple[np.ndarray, float]:
    lib = _load()
    assert lib is not None, "native solver not built (make -C native)"
    n = dist.shape[0]
    d = np.ascontiguousarray(dist, np.float64)
    tour = np.empty(n, np.int32)
    cost = lib.tsp_solve(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, restarts,
        ctypes.c_uint64(seed), tour.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return tour.astype(np.int64), float(cost)


def held_karp(dist: np.ndarray) -> Tuple[np.ndarray, float]:
    lib = _load()
    assert lib is not None, "native solver not built (make -C native)"
    n = dist.shape[0]
    d = np.ascontiguousarray(dist, np.float64)
    tour = np.empty(n, np.int32)
    cost = lib.tsp_held_karp(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        tour.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return tour.astype(np.int64), float(cost)
