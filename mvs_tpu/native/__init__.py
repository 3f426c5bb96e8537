"""ctypes bindings for the native C++ core (native/libmvs_native.so).

Provides the threaded KD-tree engine behind the DTU evaluation protocol —
the native counterpart of the reference's MATLAB/KDTreeSearcher stack
(Evaluation/dtu/MaxDistCP.m, reducePts_haa.m). Falls back to scipy when the
shared library hasn't been built; `python -m mvs_tpu.native.build` builds it.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["load", "available", "build", "nn_distances", "reduce_points_mask"]

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmvs_native.so"
_lib = None


def build(quiet: bool = True) -> bool:
    """Compile the shared library in-tree. Returns True on success."""
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=quiet,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def load():
    """Load (building if needed) the library; returns None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.mvs_nn_distances.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.mvs_reduce_points.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def nn_distances(query: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Euclidean distance from each query point to its nearest target point."""
    lib = load()
    query = np.ascontiguousarray(query, dtype=np.float32)
    target = np.ascontiguousarray(target, dtype=np.float32)
    if lib is None:
        from scipy.spatial import cKDTree

        return cKDTree(target).query(query, k=1, workers=-1)[0].astype(np.float32)
    out = np.empty(len(query), dtype=np.float32)
    lib.mvs_nn_distances(_fptr(query), len(query), _fptr(target), len(target),
                         _fptr(out))
    return out


def reduce_points_mask(pts: np.ndarray, dst: float,
                       seed: int | None = 0) -> np.ndarray:
    """Stochastic decimation keep-mask (reducePts_haa semantics)."""
    lib = load()
    pts = np.ascontiguousarray(pts, dtype=np.float32)
    n = len(pts)
    rng = np.random.default_rng(seed)
    order = (rng.permutation(n) if seed is not None
             else np.random.permutation(n)).astype(np.int32)
    if lib is None:
        from mvs_tpu.dtu_eval.protocol import reduce_points

        return reduce_points(pts, dst, seed=seed)
    keep = np.empty(n, dtype=np.uint8)
    lib.mvs_reduce_points(
        _fptr(pts), n, order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_float(dst), keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return keep.astype(bool)
