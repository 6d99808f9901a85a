"""ctypes bindings for the host-side C++ kernels (``_native.cpp``).

Built on demand with g++ (cached next to the source); every entry point
has a numpy fallback at its call site, so environments without a
compiler still work.  Build failures raise :class:`OSError` so the
call-site ``except (ImportError, OSError)`` fallbacks engage uniformly.
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
_build_error: Optional[Exception] = None


def _build() -> None:
    # build to a per-pid temp file and rename: parallel processes
    # (pytest -n) must never dlopen a partially written .so, and rename
    # within one directory is atomic
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-march=native", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB)
    except subprocess.CalledProcessError as e:
        raise OSError(
            f"native build failed: {e.stderr.decode(errors='replace')[-500:]}"
        ) from e
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def load() -> ctypes.CDLL:
    """Load (building if necessary) the native library."""
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            # don't re-spawn g++ on every call after a failed build
            raise OSError(f"native build previously failed: {_build_error}")
        stale = (not os.path.exists(_LIB)
                 or os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
        if stale:
            try:
                _build()
            except OSError:
                if os.path.exists(_LIB):
                    # a checkout can order mtimes arbitrarily: a usable
                    # prebuilt .so beats no native path at all
                    pass
                else:
                    _build_error = OSError("build failed, no prebuilt .so")
                    raise
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
    if a.shape[0] == 0 or b.shape[0] == 0:
        raise ValueError(
            f"empty point cloud: |a|={a.shape[0]} |b|={b.shape[0]} — a "
            f"silent 1e30/NaN score would masquerade as a measurement")
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
    """Fast text .xyz loader (columns >= 3; extra columns kept).

    Only handles plain numeric rows — files with comment lines,
    leading blanks, or a ragged float count (possible header tokens)
    raise :class:`OSError` so the caller's ``np.loadtxt`` fallback
    (which understands ``#`` comments) takes over rather than this
    parser silently mis-aligning columns.
    """
    lib = load()
    with open(path, "rb") as f:
        raw = f.read()
    first = raw.split(b"\n", 1)[0].split()
    if not first or any(t.startswith(b"#") for t in first):
        raise OSError("non-numeric .xyz header; use the loadtxt path")
    ncol = len(first)
    cap = len(raw) // 2 + ncol
    buf = np.empty(cap, np.float32)
    n = lib.parse_floats(raw, len(raw), buf, cap)
    if n % ncol:
        raise OSError(
            f"parsed float count {n} not divisible by column count "
            f"{ncol}; file has comments/ragged rows — use loadtxt")
    pts = buf[:n].reshape(-1, ncol)
    if max_points is not None:
        pts = pts[:max_points]
    return pts
