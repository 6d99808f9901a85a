"""Patch-parallel inference over a device mesh.

The inference scaling axis is the top-level patch batch (SURVEY.md
§2.3).  There is ONE pipeline: :func:`threepu.inference.
upsample_point_cloud` takes a ``mesh`` argument and runs the cascade —
all the FLOPs — under ``shard_map`` with the patch axis sharded over
ICI, while seed-FPS/grouping/final-FPS stay in the same jit program.
Every serial-path feature (bucketing, ``valid_n`` masking, the
outlier-masked sub-patch path) therefore applies identically when
sharded; this module only keeps the convenience constructor.
"""

from __future__ import annotations

from typing import Optional

from threepu.models import Net


def make_sharded_upsampler(net: Net, mesh, ratio: int, num_point: int,
                           num_patches: Optional[int] = None,
                           num_out: Optional[int] = None,
                           chunk: Optional[int] = None,
                           axis_name: str = "data"):
    """Build a ``(params, xyz (N,3)) -> (num_out, 3)`` upsampler with the
    patch axis sharded over ``mesh``.

    ``num_patches`` overrides the reference patch-count formula
    ``int(N / num_point * patch_num_ratio)`` (``main.py:225``) by
    solving for the equivalent ``patch_num_ratio``; padding patches
    beyond the true count are masked out of the final FPS by the
    shared pipeline.
    """
    from threepu.inference import upsample_point_cloud

    def upsample(params, xyz):
        n_out = num_out if num_out is not None else xyz.shape[0] * ratio
        ratio_kw = {}
        if num_patches is not None:
            # plan_patches floors N / num_point * pnr; a tiny epsilon
            # makes the requested count exact after the floor
            ratio_kw["patch_num_ratio"] = (
                num_patches * num_point / xyz.shape[0] + 1e-9)
        return upsample_point_cloud(
            net, params, xyz, ratio, num_point, n_out, chunk=chunk,
            mesh=mesh, axis_name=axis_name, **ratio_kw)

    return upsample
