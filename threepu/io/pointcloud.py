"""Point-cloud file loading (dispatch on extension).

Reference equivalent: ``utils/pc_utils.py:223-241`` (``load``) — ``.ply``
via the PLY reader, anything else via ``np.loadtxt`` (``.xyz``), padded
with random repeats or FPS-downsampled to ``count``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from threepu.io.ply import read_ply, save_ply
from threepu.utils.pc_utils import downsample_points


def _load_text(filename: str) -> np.ndarray:
    """Text (.xyz etc.) loader: the native C++ float parser when the
    toolchain can build it (~20x np.loadtxt), numpy otherwise."""
    try:
        from threepu.native import parse_xyz
        return parse_xyz(filename)
    except Exception:
        return np.loadtxt(filename).astype(np.float32)


def load(filename: str, count: Optional[int] = None) -> np.ndarray:
    if filename.endswith(".ply"):
        return read_ply(filename, count)[:, :3].astype(np.float32)
    points = _load_text(filename)
    if points.ndim == 1:
        points = points[None, :]
    if count is not None:
        if count > points.shape[0]:
            extra = points[np.random.choice(points.shape[0],
                                            count - points.shape[0])]
            points = np.concatenate([points, extra], axis=0)
        elif count < points.shape[0]:
            points = downsample_points(points, count)
    return points


def save(points: np.ndarray, filename: str, **kwargs) -> None:
    if filename.endswith(".ply"):
        save_ply(points, filename, **kwargs)
    else:
        np.savetxt(filename, points)
