"""ctypes bindings for the host-side C++ kernels (``_native.cpp``).

Built on demand with g++ (cached next to the source); every entry point
has a numpy fallback at its call site, so environments without a
compiler still work.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "_native.cpp")
_LIB = os.path.join(_HERE, "_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-march=native", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def load() -> ctypes.CDLL:
    """Load (building if necessary) the native library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        i64 = ctypes.c_int64
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.fps_f32.argtypes = [f32p, i64, i64, i64, i32p]
        lib.fps_f32.restype = None
        lib.nn_dist2_f32.argtypes = [f32p, i64, f32p, i64, f32p, i32p,
                                     f32p, i32p]
        lib.nn_dist2_f32.restype = None
        lib.parse_floats.argtypes = [ctypes.c_char_p, i64, f32p, i64]
        lib.parse_floats.restype = i64
        _lib = lib
        return lib


def fps_cpu(points: np.ndarray, m: int, seed: int = 0) -> np.ndarray:
    """FPS indices (selection order) on the host.  Same semantics as
    :func:`threepu.ops.fps.fps_indices` with a configurable seed (the
    reference's numpy ``FarthestSampler`` seeds randomly,
    ``utils/pc_utils.py:120``)."""
    lib = load()
    points = np.ascontiguousarray(points[:, :3], np.float32)
    out = np.empty(m, np.int32)
    lib.fps_f32(points, points.shape[0], m, seed, out)
    return out


def nn_dist2_cpu(a: np.ndarray, b: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host bidirectional NN squared distances (the parity metric)."""
    lib = load()
    a = np.ascontiguousarray(a[:, :3], np.float32)
    b = np.ascontiguousarray(b[:, :3], np.float32)
    da = np.empty(a.shape[0], np.float32)
    ia = np.empty(a.shape[0], np.int32)
    db = np.empty(b.shape[0], np.float32)
    ib = np.empty(b.shape[0], np.int32)
    lib.nn_dist2_f32(a, a.shape[0], b, b.shape[0], da, ia, db, ib)
    return da, ia, db, ib


def chamfer_cpu(a: np.ndarray, b: np.ndarray) -> float:
    """Mean bidirectional Chamfer distance (squared), host-side."""
    da, _, db, _ = nn_dist2_cpu(a, b)
    return float(da.mean() + db.mean())


def parse_xyz(path: str, max_points: Optional[int] = None) -> np.ndarray:
    """Fast text .xyz loader (columns >= 3; extra columns kept)."""
    lib = load()
    with open(path, "rb") as f:
        raw = f.read()
    # column count from the first line
    first = raw.split(b"\n", 1)[0].split()
    ncol = max(len(first), 1)
    cap = len(raw) // 2 + ncol
    buf = np.empty(cap, np.float32)
    n = lib.parse_floats(raw, len(raw), buf, cap)
    n = (n // ncol) * ncol
    pts = buf[:n].reshape(-1, ncol)
    if max_points is not None:
        pts = pts[:max_points]
    return pts
