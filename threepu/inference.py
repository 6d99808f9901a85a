"""Whole-shape upsampling pipeline.

Reference equivalent: ``pc_prediction`` + ``test`` (``main.py:214-246,
333-389``) — FPS patch seeds, kNN patch grouping, per-patch normalize,
cascade forward, denormalize, concat, final FPS down to ``N * ratio``.

TPU re-design: the reference's serial per-patch python loop
(``main.py:237-244``) becomes one jit-compiled program: all patches are
grouped at once and the cascade runs over patch *chunks* with
``lax.map`` (bounding peak memory; chunk size static).  The final
re-stitch FPS runs on device with the Pallas kernel.  Host touches data
exactly twice: upload the shape, download the result.
"""

from __future__ import annotations


from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from threepu.models import Net
from threepu.ops import knn_group, gather_nd
from threepu.ops.fps import PALLAS_MAX_N, _dispatch_fps, fps_hierarchical
from threepu.ops.normalize import normalize_point_batch_cl

Array = jax.Array


def plan_patches(num_shape_point: int, num_point: int,
                 patch_num_ratio: float = 3.0,
                 chunk: Optional[int] = None,
                 n_dev: int = 1) -> Tuple[int, int, int]:
    """(num_patches, padded_num_patches, chunk): the reference patch
    count ``int(N / num_point * patch_num_ratio)`` (``main.py:225``),
    padded up so the chunked map divides evenly — and, for a sharded run
    (``n_dev > 1``), so every device gets the same whole number of
    chunks."""
    num_patches = int(num_shape_point / num_point * patch_num_ratio)
    num_patches = max(num_patches, 1)
    local = -(-num_patches // n_dev)
    if chunk is None or chunk >= local:
        chunk = local
    padded = -(-num_patches // (chunk * n_dev)) * chunk * n_dev
    return num_patches, padded, chunk


#: default group count for the hierarchical final restitch, and the
#: pick count from which it engages when ``restitch_groups`` is left
#: unset.  Settled in round 4 at TRAINED weights (120k-step production
#: checkpoint, ``benchmarks/restitch_quality.py``): G=8 held-out 16x
#: Chamfer 3.505e-4 vs exact G=1 3.518e-4 (equal within noise — the
#: G-to-G selection difference is 0.4x the output's own NN spacing^2),
#: input-coverage identical to 4 digits, +8% headline throughput and
#: ~5x faster compile (the 80k sequential pick chain shrinks G-fold).
#: Below the gate the pick chain is short, hierarchy buys nothing, and
#: the reference-exact FPS (``main.py:379-380``) is kept for
#: bit-parity.  Pass ``restitch_groups=1`` to force exact everywhere.
DEFAULT_RESTITCH_GROUPS = 8
RESTITCH_AUTO_MIN_OUT = 16384


def resolve_restitch_groups(requested: Optional[int],
                            num_out: int) -> int:
    """Resolve the ``restitch_groups`` argument (``None`` = auto)."""
    if requested is not None:
        return requested
    return DEFAULT_RESTITCH_GROUPS if num_out >= RESTITCH_AUTO_MIN_OUT \
        else 1


@partial(jax.jit,
         static_argnames=("net", "ratio", "num_point", "num_out",
                          "patch_num_ratio", "chunk", "mesh",
                          "axis_name", "restitch_groups"))
def upsample_point_cloud(net: Net, params, xyz: Array, ratio: int,
                         num_point: int, num_out: int,
                         patch_num_ratio: float = 3.0,
                         chunk: Optional[int] = None,
                         valid_n: Optional[Array] = None,
                         valid_patches: Optional[Array] = None,
                         mesh=None, axis_name: str = "data",
                         restitch_groups: Optional[int] = None) -> Array:
    """Upsample one (normalized) shape.

    Args:
      xyz: ``(N, 3)`` the whole shape, already normalized to the unit
        sphere (the reference normalizes in ``test()``, ``main.py:352``).
      ratio: upsampling ratio (static).
      num_point: patch size (NUM_POINT, default 312).
      num_out: output point count (``int(num_shape_point) * ratio``,
        ``main.py:379-380``).
      valid_n: optional traced scalar — only the first ``valid_n`` rows
        of ``xyz`` are real (bucketed mixed-size datasets: ``xyz`` is
        padded to a static bucket so one compile serves every size in
        the bucket).  FPS selection is prefix-consistent — the first k
        picks of an m-pick run equal a k-pick run — and masked points
        are unselectable, so bucketing has the same selection semantics
        as an exact-size compile.  Equality caveat: bucketed and exact
        sizes compile to *different* XLA programs, and on TPU the
        compiler's fusion/FMA choices can differ between them, flipping
        kNN/FPS near-ties; outputs then agree as point *sets* (measured
        Chamfer ~2e-10 vs a ~1e-3 spacing scale) rather than bit-for-bit
        row order.  On CPU (and whenever the compiled programs match)
        the result is bit-identical.
      valid_patches: traced scalar, the reference patch count for the
        real size (``int(true_n / num_point * patch_num_ratio)``); seeds
        beyond it are masked out of the merge.
      mesh: optional ``jax.sharding.Mesh`` — the cascade (all the FLOPs)
        runs under ``shard_map`` with the patch axis sharded over
        ``axis_name``; seed-FPS/grouping/final-FPS run in the same jit
        program with XLA-chosen shardings.  Every serial-path feature
        (bucketing, ``valid_n`` masking, outlier-masked sub-patching)
        applies identically — there is ONE pipeline.
      restitch_groups: ``None`` (default) = auto: G=8 hierarchical
        restitch for large outputs (``num_out >=``
        :data:`RESTITCH_AUTO_MIN_OUT`), reference-exact FPS below —
        see :data:`DEFAULT_RESTITCH_GROUPS` for the trained-weights
        quality measurement behind the default.  1 keeps the
        reference's exact final FPS (``main.py:379-380``) everywhere.
        G > 1 runs the final re-stitch as Morton-stratified
        hierarchical FPS over G spatial groups — the same documented
        approximation large clouds use unconditionally above
        :data:`~threepu.ops.fps.PALLAS_MAX_N` points (coverage radius
        within ~1-4% of exact at G=2..8,
        ``benchmarks/fps_quality.py``) — cutting the restitch's
        sequential pick chain (and its wall-clock) ~G-fold.  Only the
        final merge FPS is affected; seed selection stays exact.

    Returns:
      ``(num_out, 3)`` upsampled shape in the same normalized frame;
      with bucketing, callers slice the first ``true_n * ratio`` rows
      (FPS prefix consistency again).
    """
    n = xyz.shape[0]
    n_dev = mesh.devices.size if mesh is not None else 1
    num_patches, padded, chunk = plan_patches(n, num_point,
                                              patch_num_ratio, chunk,
                                              n_dev)

    # seed-FPS + grouping over the whole shape (main.py:228-235)
    shape_b = xyz[None]                                       # (1, N, 3)
    n_mask = None
    if valid_n is not None:
        n_mask = (jnp.arange(n) < valid_n)[None]              # (1, N)
    seed_idx = _dispatch_fps(shape_b, num_patches, n_mask, None)
    seeds = gather_nd(shape_b, seed_idx)                      # (1, P, 3)
    patches = knn_group(seeds, shape_b, num_point,
                        valid_mask=n_mask).neighbors[0]

    if padded != num_patches:
        pad = jnp.broadcast_to(patches[:1],
                               (padded - num_patches,) + patches.shape[1:])
        patches = jnp.concatenate([patches, pad], axis=0)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        patches = jax.lax.with_sharding_constraint(
            patches, NamedSharding(mesh, P()))

    norm, centroid, radius = normalize_point_batch_cl(patches)

    def run_chunks(p, patches, count):                # (count*chunk, K, 3)
        chunked = patches.reshape(count, chunk, num_point, 3)
        up = jax.lax.map(
            lambda c: net.apply({"params": p}, c, ratio, train=False),
            chunked)
        return up.reshape(count * chunk, num_point * ratio, 3)

    if mesh is None:
        up = run_chunks(params, norm, padded // chunk)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        norm = jax.lax.with_sharding_constraint(
            norm, NamedSharding(mesh, P(axis_name, None, None)))
        local = padded // n_dev
        up = jax.shard_map(
            partial(run_chunks, count=local // chunk), mesh=mesh,
            in_specs=(P(), P(axis_name, None, None)),
            out_specs=P(axis_name, None, None))(params, norm)
    up = up * radius + centroid                               # denormalize

    merged = up.reshape(1, padded * num_point * ratio, 3)
    if mesh is not None:
        # Merge = ONE all-gather of the denormalized upsampled patches
        # (the designed collective, SURVEY §2.3); the restitch FPS then
        # runs replicated.  Without this constraint GSPMD propagates
        # the patch sharding (via the sharded centroid/radius of the
        # denormalize) into the FPS pick loop and emits two tiny
        # collectives PER PICK (num_out of them — 160k ICI ops at the
        # headline).  The earlier `patches` constraint stops the
        # backward leg into the seed FPS (replicated -> sharded at
        # `norm` is a local slice, no communication).
        from jax.sharding import NamedSharding, PartitionSpec as P
        merged = jax.lax.with_sharding_constraint(
            merged, NamedSharding(mesh, P()))
    valid = None
    patch_limit = None
    if valid_patches is not None:
        patch_limit = valid_patches
    elif padded != num_patches:
        patch_limit = num_patches
    if patch_limit is not None:
        valid = (jnp.arange(padded)[:, None] < patch_limit)
        valid = jnp.broadcast_to(
            valid, (padded, num_point * ratio)).reshape(1, -1)
    restitch_groups = resolve_restitch_groups(restitch_groups, num_out)
    if restitch_groups > 1:
        # cap at the kernel's VMEM bound: a small requested group count
        # on a huge merge must not produce groups the Pallas kernel
        # cannot hold (restitch_groups is a lower bound on grouping)
        group_max = min(-(-merged.shape[1] // restitch_groups),
                        PALLAS_MAX_N)
        final_idx = fps_hierarchical(merged, num_out, valid_mask=valid,
                                     group_max=group_max)
    else:
        final_idx = _dispatch_fps(merged, num_out, valid, None)
    out = gather_nd(merged, final_idx)[0]
    if mesh is not None:
        # pin the result replicated: the jit output sharding is
        # otherwise unconstrained and GSPMD propagates its chosen
        # sharding BACKWARD into the restitch FPS pick loop (two tiny
        # collectives per pick)
        from jax.sharding import NamedSharding, PartitionSpec as P
        out = jax.lax.with_sharding_constraint(out, NamedSharding(mesh, P()))
    return out


def bucket_size(n: int, quantum: int = 1024) -> int:
    """Round a point count up to the next bucket boundary."""
    return -(-n // quantum) * quantum


def upsample_shape(net: Net, params, points: np.ndarray, ratio: int,
                   num_point: int = 312, patch_num_ratio: float = 3.0,
                   chunk: Optional[int] = 8,
                   num_shape_point: Optional[int] = None,
                   jitter: bool = False, jitter_sigma: float = 0.0025,
                   jitter_max: float = 0.005,
                   drop_out: float = 1.0,
                   seed: int = 0,
                   bucket: Optional[int] = None,
                   mesh=None,
                   restitch_groups: Optional[int] = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-facing convenience mirroring ``test()``'s per-file flow
    (``main.py:341-389``): optional FPS drop-out, normalize, optional
    jitter, device pipeline, denormalize.

    ``bucket`` (a point-count quantum, e.g. 1024) enables static-shape
    bucketing for mixed-size datasets: the shape is zero-padded up to
    the bucket boundary and masked through seed-FPS / grouping / final
    FPS, so every size in a bucket shares ONE compiled program instead
    of paying a fresh ~minute-scale XLA compile per distinct size.
    Selection semantics are identical to an exact-size compile; outputs
    are bit-identical on CPU and set-identical (Chamfer level) on TPU,
    where the two distinct XLA programs may round differently (see
    :func:`upsample_point_cloud`).

    Returns (input points as processed, upsampled points), both in the
    original coordinate frame.
    """
    from threepu.utils import pc_utils

    points = np.asarray(points, np.float32)[..., :3]
    n_target = num_shape_point or points.shape[0]
    n_keep = int(n_target * drop_out)
    if drop_out < 1.0:
        pts_b = jnp.asarray(points[None])
        idx = _dispatch_fps(pts_b, n_keep, None, None)
        points = np.asarray(gather_nd(pts_b, idx)[0])

    data, centroid, furthest = pc_utils.normalize_point_cloud(points)
    is_2d = bool(np.all(data[:, 2] == 0))
    if jitter:
        data = pc_utils.jitter_perturbation_point_cloud(
            data[None], sigma=jitter_sigma, clip=jitter_max,
            is_2D=is_2d)[0]

    num_out = int(n_keep) * ratio
    n_real = data.shape[0]
    if bucket is not None and bucket_size(n_real, bucket) != n_real:
        n_b = bucket_size(n_real, bucket)
        true_patches = max(
            int(n_real / num_point * patch_num_ratio), 1)
        padded = np.zeros((n_b, 3), np.float32)
        padded[:n_real] = data
        up = upsample_point_cloud(
            net, params, jnp.asarray(padded), ratio, num_point,
            n_b * ratio, patch_num_ratio=patch_num_ratio, chunk=chunk,
            valid_n=jnp.asarray(n_real, jnp.int32),
            valid_patches=jnp.asarray(true_patches, jnp.int32),
            mesh=mesh, restitch_groups=restitch_groups)
        up = np.asarray(up)[:num_out]
    else:
        up = np.asarray(upsample_point_cloud(
            net, params, jnp.asarray(data), ratio, num_point, num_out,
            patch_num_ratio=patch_num_ratio, chunk=chunk, mesh=mesh,
            restitch_groups=restitch_groups))
    up = up * furthest + centroid
    data = data * furthest + centroid
    return data, up
