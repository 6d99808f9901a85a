"""Drop-in compatibility layer mirroring the reference's call surface.

Users porting scripts from the reference can keep their code shape:

- ``operations``-style functions live in :mod:`threepu.ops` with the
  same names and NCHW conventions (``group_knn``,
  ``furthest_point_sample``, ``gather_points``,
  ``normalize_point_batch``);
- this module adds the ``main.py``-level helpers: ``pc_prediction``
  (``main.py:214-246``) and a ``get_stage_progress`` alias
  (``main.py:118-124``).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from threepu.data.curriculum import stage_progress as get_stage_progress  # noqa: F401
from threepu.inference import plan_patches
from threepu.ops import knn_group, gather_nd
from threepu.ops.fps import _dispatch_fps
from threepu.ops.normalize import normalize_point_batch_cl


def pc_prediction(net, params, input_pc, ratio: int,
                  num_point: int = 312, patch_num_ratio: float = 3.0,
                  chunk: int = 8) -> Tuple[List, List]:
    """Reference-compatible patch prediction (``main.py:214-246``).

    Args:
      input_pc: ``(1, 3, N)`` (the reference NCHW layout).

    Returns:
      (input_list, up_point_list): per-patch ``(1, 3, K)`` inputs and
      ``(1, 3, K*ratio)`` upsampled patches — computed by the batched
      device pipeline, then split to match the reference's list-of-
      patches return shape.
    """
    xyz = jnp.swapaxes(input_pc, 1, 2)[0]                   # (N, 3)
    n = xyz.shape[0]
    num_patches, _, _ = plan_patches(n, num_point, patch_num_ratio)

    shape_b = xyz[None]
    seed_idx = _dispatch_fps(shape_b, num_patches, None, None)
    seeds = gather_nd(shape_b, seed_idx)
    patches = knn_group(seeds, shape_b, num_point).neighbors[0]
    norm, centroid, radius = normalize_point_batch_cl(patches)

    ups = []
    for start in range(0, num_patches, chunk):
        block = norm[start:start + chunk]
        out = net.apply({"params": params}, block, ratio, train=False)
        ups.append(out)
    up = jnp.concatenate(ups, axis=0) * radius + centroid

    input_list = [jnp.swapaxes(norm[i][None], 1, 2)
                  for i in range(num_patches)]
    up_list = [jnp.swapaxes(up[i][None], 1, 2)
               for i in range(num_patches)]
    return input_list, up_list
