"""ctypes bindings for the native host kNN library.

Builds ``exact_knn.cc`` with g++ on first use (cached in the package dir;
no pybind11 in this toolchain — plain C ABI). This is the FAISS-role
native runtime component: exact search for host-resident embeddings and an
independent oracle for the device path (tests/test_knn.py cross-checks all
three implementations).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from pathlib import Path
from typing import Tuple

import numpy as np

_SRC = Path(__file__).parent / "csrc" / "exact_knn.cc"
_LIB = Path(__file__).parent / "csrc" / "_exact_knn.so"


def _build() -> Path:
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = [
        "g++", "-O3", "-march=native", "-ffast-math", "-shared", "-fPIC",
        "-std=c++17", str(_SRC), "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


@functools.lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(str(_build()))
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.exact_knn_search.argtypes = [
        f32, ctypes.c_int64, f32, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, f32, i32,
    ]
    lib.exact_knn_search.restype = None
    lib.pair_distance.argtypes = [f32, f32, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, f32]
    lib.pair_distance.restype = None
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def search(xb: np.ndarray, xq: np.ndarray, k: int, metric: str = "ip") -> Tuple[np.ndarray, np.ndarray]:
    """FAISS-compatible exact search on host ('ip' descending inner
    products, 'l2' ascending squared distances; ascending-index ties).
    ``k > len(xb)`` pads the tail slots with score -inf (+inf distance for
    'l2') and index ``len(xb)`` — the device path's padding contract."""
    xb = np.ascontiguousarray(xb, np.float32)
    xq = np.ascontiguousarray(xq, np.float32)
    assert xb.ndim == 2 and xq.ndim == 2 and xb.shape[1] == xq.shape[1], (xb.shape, xq.shape)
    assert k >= 1
    n_q = len(xq)
    scores = np.empty((n_q, k), np.float32)
    idx = np.empty((n_q, k), np.int32)
    _lib().exact_knn_search(
        xb, len(xb), xq, n_q, xb.shape[1], k, 0 if metric == "ip" else 1, scores, idx
    )
    return scores, idx


def pair_distances(a: np.ndarray, b: np.ndarray, metric: str = "cosine") -> np.ndarray:
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    # the C kernel reads len(a) rows of width a.shape[1] from BOTH arrays
    assert a.shape == b.shape and a.ndim == 2, (a.shape, b.shape)
    out = np.empty(len(a), np.float32)
    _lib().pair_distance(a, b, len(a), a.shape[1], 0 if metric == "cosine" else 1, out)
    return out
