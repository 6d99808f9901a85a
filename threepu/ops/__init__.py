"""Geometric ops core (maps reference layers L2+L3: the CUDA extensions
``sampling/`` and ``losses/`` plus the Python API ``network/operations.py``)."""

from threepu.ops.distances import pairwise_dist2, direct_dist2, duplicate_mask
from threepu.ops.knn import knn_group, group_knn, KnnResult
from threepu.ops.fps import fps_indices, furthest_point_sample
from threepu.ops.gather import gather_points, gather_nd, batched_gather
from threepu.ops.ball_query import ball_query
from threepu.ops.normalize import normalize_point_batch, normalize_point_batch_cl
from threepu.ops.chamfer import nn_distance, nndistance, self_nn_dist2

__all__ = [
    "pairwise_dist2", "direct_dist2", "duplicate_mask",
    "knn_group", "group_knn", "KnnResult",
    "fps_indices", "furthest_point_sample",
    "gather_points", "gather_nd", "batched_gather",
    "ball_query",
    "normalize_point_batch", "normalize_point_batch_cl",
    "nn_distance", "nndistance", "self_nn_dist2",
]
