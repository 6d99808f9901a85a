"""Patch-parallel inference over a device mesh.

The inference scaling axis is the top-level patch batch (SURVEY.md
§2.3): seed-FPS and grouping are cheap and run replicated; the cascade —
all the FLOPs — runs under ``shard_map`` with the patch axis sharded
over ICI; the merged outputs are all-gathered (implicitly, on exiting
the shard_map) for the final re-stitch FPS.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from threepu.models import Net
from threepu.ops import knn_group, gather_nd
from threepu.ops.fps import _dispatch_fps
from threepu.ops.normalize import normalize_point_batch_cl


def make_sharded_upsampler(net: Net, mesh, ratio: int, num_point: int,
                           num_patches: int, num_out: int,
                           chunk: Optional[int] = None,
                           axis_name: str = "data"):
    """Build a jitted ``(params, xyz (N,3)) -> (num_out, 3)`` upsampler
    with the patch axis sharded over ``mesh``.

    ``num_patches`` is padded up to a multiple of the mesh size; padded
    patches are masked out of the final FPS.
    """
    n_dev = mesh.devices.size
    padded = -(-num_patches // n_dev) * n_dev
    local = padded // n_dev
    if chunk is None or chunk > local:
        chunk = local
    local_pad = -(-local // chunk) * chunk

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(axis_name, None, None)),
             out_specs=P(axis_name, None, None))
    def run_patches(params, patches):                 # local (L, K, 3)
        norm, centroid, radius = normalize_point_batch_cl(patches)
        if local_pad != local:
            extra = jnp.broadcast_to(
                norm[:1], (local_pad - local,) + norm.shape[1:])
            norm = jnp.concatenate([norm, extra], axis=0)
        chunked = norm.reshape(local_pad // chunk, chunk, num_point, 3)
        up = jax.lax.map(
            lambda c: net.apply({"params": params}, c, ratio, train=False),
            chunked)
        up = up.reshape(local_pad, num_point * ratio, 3)[:local]
        return up * radius + centroid

    @partial(jax.jit)
    def upsample(params, xyz):
        shape_b = xyz[None]
        seed_idx = _dispatch_fps(shape_b, num_patches, None, None)
        seeds = gather_nd(shape_b, seed_idx)
        patches = knn_group(seeds, shape_b, num_point).neighbors[0]
        if padded != num_patches:
            pad = jnp.broadcast_to(
                patches[:1], (padded - num_patches,) + patches.shape[1:])
            patches = jnp.concatenate([patches, pad], axis=0)
        patches = jax.lax.with_sharding_constraint(
            patches, NamedSharding(mesh, P(axis_name, None, None)))
        up = run_patches(params, patches)
        merged = up.reshape(1, padded * num_point * ratio, 3)
        valid = None
        if padded != num_patches:
            valid = jnp.broadcast_to(
                (jnp.arange(padded)[:, None] < num_patches),
                (padded, num_point * ratio)).reshape(1, -1)
        final_idx = _dispatch_fps(merged, num_out, valid, None)
        return gather_nd(merged, final_idx)[0]

    return upsample
