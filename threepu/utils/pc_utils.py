"""Host-side (numpy) point-cloud utilities.

Numpy twin of the device ops, mirroring ``utils/pc_utils.py`` of the
reference.  Implements the *intended* behaviour of the documented
reference bugs (SURVEY.md §7): ``jitter_perturbation_point_cloud`` uses
a valid randn call (the reference's ``np.random.randn(..., dtype=...)``
at ``pc_utils.py:39`` is invalid numpy).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def normalize_point_cloud(pc: np.ndarray):
    """pc (N, 3) or (B, N, 3) -> (normalized, centroid, furthest_distance)
    (reference ``utils/pc_utils.py:11-25``)."""
    axis = 0 if pc.ndim == 2 else 1
    centroid = np.mean(pc, axis=axis, keepdims=True)
    pc = pc - centroid
    furthest = np.amax(np.sqrt(np.sum(pc ** 2, axis=-1, keepdims=True)),
                       axis=axis, keepdims=True)
    return pc / furthest, centroid, furthest


def jitter_perturbation_point_cloud(batch_data: np.ndarray,
                                    sigma: float = 0.005,
                                    clip: float = 0.02,
                                    is_2D: bool = False) -> np.ndarray:
    """Per-point gaussian jitter, clipped; z untouched for 2D data
    (reference ``utils/pc_utils.py:28-42``, with the dtype bug fixed)."""
    assert clip > 0
    b, n, c = batch_data.shape
    chn = 2 if is_2D else 3
    jitter = np.clip(sigma * np.random.randn(b, n, c), -clip, clip)
    jitter = jitter.astype(batch_data.dtype)
    jitter[:, :, chn:] = 0
    return batch_data + jitter


def random_rotation_matrix(dtype=np.float32,
                           rng: Optional[np.random.Generator] = None
                           ) -> np.ndarray:
    """Composed Rz @ Ry @ Rx with uniform angles
    (reference ``utils/pc_utils.py:53-64``)."""
    rand = rng.uniform(size=3) if rng is not None else np.random.uniform(
        size=3)
    angles = rand * 2 * np.pi
    cx, sx = np.cos(angles[0]), np.sin(angles[0])
    cy, sy = np.cos(angles[1]), np.sin(angles[1])
    cz, sz = np.cos(angles[2]), np.sin(angles[2])
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], dtype)
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], dtype)
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], dtype)
    return np.dot(rz, np.dot(ry, rx))


def rotate_point_cloud_and_gt(batch_data: np.ndarray,
                              batch_gt: Optional[np.ndarray] = None):
    """Per-shape random 3-axis rotation, shared between input and gt;
    also rotates normal channels when present
    (reference ``utils/pc_utils.py:45-79``)."""
    batch_data = batch_data.copy()
    batch_gt = batch_gt.copy() if batch_gt is not None else None
    for k in range(batch_data.shape[0]):
        rot = random_rotation_matrix(batch_data.dtype)
        batch_data[k, ..., 0:3] = batch_data[k, ..., 0:3] @ rot
        if batch_data.shape[-1] > 3:
            batch_data[k, ..., 3:6] = batch_data[k, ..., 3:6] @ rot
        if batch_gt is not None:
            batch_gt[k, ..., 0:3] = batch_gt[k, ..., 0:3] @ rot
            if batch_gt.shape[-1] > 3:
                batch_gt[k, ..., 3:6] = batch_gt[k, ..., 3:6] @ rot
    return batch_data, batch_gt


def random_scale_point_cloud_and_gt(batch_data, batch_gt=None,
                                    scale_low=0.5, scale_high=2.0):
    """Per-cloud random scaling (reference ``utils/pc_utils.py:82-97``)."""
    b = batch_data.shape[0]
    scales = np.random.uniform(scale_low, scale_high,
                               (b, 1, 1)).astype(batch_data.dtype)
    batch_data = np.concatenate(
        [batch_data[:, :, :3] * scales, batch_data[:, :, 3:]], axis=-1)
    if batch_gt is not None:
        batch_gt = np.concatenate(
            [batch_gt[:, :, :3] * scales, batch_gt[:, :, 3:]], axis=-1)
    return batch_data, batch_gt, np.squeeze(scales)


class FarthestSampler:
    """Pure-numpy FPS with random seed (reference
    ``utils/pc_utils.py:111-126``); used for host-side downsampling."""

    def _calc_distances(self, p0, points):
        return ((p0 - points[:, :3]) ** 2).sum(axis=1)

    def __call__(self, pts: np.ndarray, k: int) -> np.ndarray:
        farthest = np.zeros((k, pts.shape[1]), dtype=np.float32)
        seed = np.random.randint(len(pts))
        farthest[0] = pts[seed]
        distances = self._calc_distances(farthest[0, :3], pts)
        for i in range(1, k):
            farthest[i] = pts[np.argmax(distances)]
            distances = np.minimum(
                distances, self._calc_distances(farthest[i, :3], pts))
        return farthest


def downsample_points(pts: np.ndarray, k: int) -> np.ndarray:
    """FPS when the cloud is >= 2x the target, random choice otherwise
    (reference ``utils/pc_utils.py:100-108``).  Uses the native C++ FPS
    when built, else the numpy sampler."""
    if pts.shape[0] >= 2 * k:
        try:
            from threepu.native import fps_cpu
            seed = np.random.randint(pts.shape[0])
            return pts[fps_cpu(np.ascontiguousarray(pts[:, :3], np.float32),
                               k, seed)]
        except (ImportError, OSError):
            return FarthestSampler()(pts, k)
    return pts[np.random.choice(pts.shape[0], k, replace=(k < pts.shape[0]))]
