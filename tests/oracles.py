"""Pure-numpy oracles mirroring the reference semantics.

Each oracle re-derives the behaviour of a reference component
independently (no torch, no copying):

- ``fps_oracle``: the iterative max-min selection of
  ``sampling/sampling_cuda.cu:103-174`` (seed = index 0, temp init 1e10);
  the reference's own numpy ``FarthestSampler``
  (``utils/pc_utils.py:111-126``) is the same algorithm with a random
  seed.
- ``knn_oracle``: dense distance matrix + unique masking of
  ``network/operations.py:151-216``.
- ``nn_distance_oracle``: ``losses/nmdistance_cuda.cu`` forward.
- ``ball_query_oracle``: the sequential scan of
  ``sampling/sampling_cuda.cu:269-305``.
"""

import numpy as np


def fps_oracle(points, m, valid=None):
    """points (N,3) -> indices (m,) in selection order."""
    n = points.shape[0]
    temp = np.full(n, 1e10, np.float64)
    if valid is not None:
        temp[~valid] = -np.inf
        seed = int(np.argmax(valid))
    else:
        seed = 0
    idx = [seed]
    last = seed
    for _ in range(1, m):
        d = np.sum((points - points[last]) ** 2, axis=1)
        temp = np.minimum(temp, d)
        last = int(np.argmax(temp))
        idx.append(last)
    return np.asarray(idx, np.int32)


def knn_oracle(query, points, k, unique=False):
    """query (M,C), points (N,C) -> (neighbors (M,k,C), idx (M,k),
    dist2 (M,k))."""
    d = (np.sum(query**2, 1, keepdims=True) - 2 * query @ points.T
         + np.sum(points**2, 1))
    if unique:
        _, first = np.unique(points, return_index=True, axis=0)
        dup = np.ones(points.shape[0], bool)
        dup[first] = False
        d = d + (d.max() + 1.0) * dup[None, :]
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    dist = np.take_along_axis(d, idx, axis=1)
    return points[idx], idx.astype(np.int32), dist


def nn_distance_oracle(a, b):
    """a (N,3), b (M,3) -> (d1 (N,), i1, d2 (M,), i2), squared dists."""
    d = np.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
    return (d.min(1), d.argmin(1).astype(np.int32),
            d.min(0), d.argmin(0).astype(np.int32))


def ball_query_oracle(radius, nsample, points, queries):
    """points (N,3), queries (M,3) -> idx (M, nsample) int32 with the
    CUDA fill semantics (slots pre-filled with the first hit; all-zero
    when no hit)."""
    m = queries.shape[0]
    out = np.zeros((m, nsample), np.int32)
    r2 = radius * radius
    for qi in range(m):
        cnt = 0
        for pi in range(points.shape[0]):
            if np.sum((points[pi] - queries[qi]) ** 2) < r2:
                if cnt == 0:
                    out[qi, :] = pi
                if cnt < nsample:
                    out[qi, cnt] = pi
                cnt += 1
            if cnt >= nsample:
                break
    return out


def normalize_oracle(pc):
    """pc (..., N, 3) -> normalized, centroid, radius."""
    centroid = pc.mean(axis=-2, keepdims=True)
    pc = pc - centroid
    radius = np.sqrt((pc ** 2).sum(-1, keepdims=True)).max(-2, keepdims=True)
    return pc / radius, centroid, radius
