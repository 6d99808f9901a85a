"""Furthest point sampling (FPS).

TPU-native equivalent of the reference CUDA kernel
(``sampling/sampling_cuda.cu:103-174``): iteratively pick the point that
maximises the minimum distance to the already-selected set, seeded with
index 0 and a min-distance carry initialised to 1e10
(``network/operations.py:288-295``).

Two implementations share exact selection semantics:

- :func:`fps_indices` — pure XLA ``lax.scan``; runs on any backend and is
  the oracle-checked fallback.
- :func:`threepu.ops.fps_pallas.fps_pallas` — a Pallas TPU kernel keeping
  the point set and the min-distance carry resident in VMEM (the CUDA
  kernel's shared-memory trick, writ large), used automatically on TPU
  for large inputs.

An optional ``valid_mask`` makes padded/outlier points unselectable — the
static-shape replacement for the reference's dynamic outlier filtering.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_INIT_DIST = 1e10


def sanitize_points(points: jax.Array,
                    valid_mask: Optional[jax.Array]):
    """Make FPS robust to non-finite coordinates: a NaN/Inf point would
    otherwise poison the min-distance carry (NaN wins argmax, then every
    later distance is NaN and selection collapses to index 0).  Treat
    such points as invalid — never selectable — and zero their
    coordinates so distances *to* them stay finite.  For fully-finite
    input this is the identity (and the all-True mask reproduces the
    unmasked carry/seed exactly)."""
    finite = jnp.all(jnp.isfinite(points), axis=-1)          # (..., N)
    points = jnp.where(finite[..., None], points, 0.0)
    mask = finite if valid_mask is None else (valid_mask & finite)
    return points, mask


@partial(jax.jit, static_argnames=("m",))
def fps_indices(points: jax.Array, m: int,
                valid_mask: Optional[jax.Array] = None) -> jax.Array:
    """Select ``m`` indices by furthest point sampling.

    Args:
      points: ``(B, N, 3)`` (any trailing channel count works).
      m: number of samples (static).
      valid_mask: optional ``(B, N)`` boolean; invalid points are never
        selected.  The seed is the first valid index (index 0 when no
        mask, matching the CUDA kernel's ``idx[0] = 0``).  Non-finite
        points are always treated as invalid (:func:`sanitize_points`).

    Returns:
      ``(B, N)``-indexed ``(B, m)`` int32 indices.
    """
    b, n, _ = points.shape
    points = points.astype(jnp.float32)
    points, valid_mask = sanitize_points(points, valid_mask)
    # derive the scan carry from `points` (zeros * points) instead of
    # fresh constants: under shard_map the carry must share the data's
    # varying manual axes or the scan rejects it (carry in/out
    # mismatch); points are finite after sanitize_points so the product
    # is a true zero
    base = points[..., 0] * 0.0                        # (B, N) "varying 0"
    seed = jnp.argmax(valid_mask, axis=-1).astype(jnp.int32) + \
        base[..., 0].astype(jnp.int32)
    temp0 = jnp.where(valid_mask, base + _INIT_DIST, base - jnp.inf)

    def step(carry, _):
        temp, last_idx = carry
        last_pt = jnp.take_along_axis(
            points, last_idx[:, None, None], axis=1)      # (B, 1, 3)
        d = jnp.sum((points - last_pt) ** 2, axis=-1)      # (B, N)
        temp = jnp.minimum(temp, d)
        nxt = jnp.argmax(temp, axis=-1).astype(jnp.int32)
        return (temp, nxt), nxt

    if m == 1:
        return seed[:, None]
    (_, _), rest = jax.lax.scan(step, (temp0, seed), None, length=m - 1)
    return jnp.concatenate([seed[:, None], rest.T], axis=1)


def furthest_point_sample(
    xyz: jax.Array, npoint: int, NCHW: bool = True,
    valid_mask: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Reference-compatible wrapper (``network/operations.py:303-323``).

    Args:
      xyz: ``(B, 3, N)`` if ``NCHW`` else ``(B, N, 3)``.
      npoint: number of samples.

    Returns:
      ``(idx (B, npoint) int32, sampled points)`` with the points in the
      same layout as the input.
    """
    if xyz.ndim != 3:
        raise ValueError(f"expected 3D tensor, got shape {xyz.shape}")
    pts = jnp.swapaxes(xyz, -1, -2) if NCHW else xyz
    if pts.shape[-1] != 3:
        raise ValueError("furthest sampling is implemented for 3D points")
    idx = _dispatch_fps(pts, npoint, valid_mask, use_pallas)
    sampled = jnp.take_along_axis(pts, idx[..., None], axis=-2)
    if NCHW:
        sampled = jnp.swapaxes(sampled, -1, -2)
    return idx, sampled


#: the Pallas kernel keeps 5 (N,) f32 planes resident in VMEM; beyond
#: this point count it cannot fit and FPS goes hierarchical.
PALLAS_MAX_N = 480_000


def _dispatch_fps(pts, npoint, valid_mask, use_pallas, m_eff=None):
    """``m_eff`` (traced scalar <= npoint) bounds the Pallas kernel's
    sequential pick loop dynamically; rows ``m_eff:`` of the result are
    then arbitrary unselected indices.  Callers that over-pick only to
    share one padded kernel instance pass their real count here (FPS
    picks are prefix-stable, so the first ``m_eff`` rows are identical
    either way).  The scan/hierarchical paths ignore it — their loop
    bound is static per compile anyway."""
    n = pts.shape[-2]
    if use_pallas is None:
        # selection is bit-identical either way
        # (benchmarks/tpu_checks.py); the kernel's runtime edge at
        # mid sizes (~1-4k) is small while every extra pallas
        # instance pays a slow axon remote kernel compile, so the
        # kernel engages where it clearly wins.  Small pick counts
        # (m < 256, e.g. the 48 patch seeds) are dominated by the
        # per-pick sequential chain either way — the XLA scan is
        # within noise there and costs no kernel compile.
        use_pallas = (n >= 4096 and npoint >= 256
                      and jax.default_backend() == "tpu")
    if use_pallas and n > PALLAS_MAX_N:
        return fps_hierarchical(pts, npoint, valid_mask=valid_mask)
    if use_pallas:
        from threepu.ops.fps_pallas import fps_pallas
        return fps_pallas(pts, npoint, valid_mask=valid_mask,
                          m_eff=m_eff)
    return fps_indices(pts, npoint, valid_mask=valid_mask)


def morton_codes(points: jax.Array, bits: int = 10,
                 valid_mask: Optional[jax.Array] = None) -> jax.Array:
    """Z-order (Morton) keys: ``(B, N, 3)`` -> ``(B, N)`` int32.

    Coordinates are min-max quantized per batch to a ``2^bits`` grid and
    their bits interleaved, so sorting by the key orders points along a
    space-filling curve — nearby keys are nearby in space.

    ``valid_mask`` (``(B, N)``) restricts the quantization range to the
    valid points: out-of-range sentinel coordinates on padded rows would
    otherwise collapse every real point into one Morton cell, silently
    degrading the stratified grouping to input order.  Masked rows get
    whatever (clipped) cell they fall in — callers sort them out
    separately."""
    if valid_mask is not None:
        m = valid_mask[..., None]
        lo = jnp.min(jnp.where(m, points, jnp.inf), axis=-2, keepdims=True)
        hi = jnp.max(jnp.where(m, points, -jnp.inf), axis=-2, keepdims=True)
    else:
        lo = jnp.min(points, axis=-2, keepdims=True)
        hi = jnp.max(points, axis=-2, keepdims=True)
    scale = (2**bits - 1) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(((points - lo) * scale).astype(jnp.int32),
                 0, 2**bits - 1)                       # (B, N, 3)

    def spread(v):  # every bit of v to every 3rd position (bits<=10)
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return (spread(q[..., 0]) | (spread(q[..., 1]) << 1)
            | (spread(q[..., 2]) << 2))


def fps_hierarchical(points: jax.Array, m: int,
                     valid_mask: Optional[jax.Array] = None,
                     group_max: int = PALLAS_MAX_N,
                     sort: str = "morton",
                     use_pallas: Optional[bool] = None) -> jax.Array:
    """FPS for clouds too large for the VMEM-resident kernel.

    Splits the cloud into G contiguous groups, runs the Pallas kernel
    per group (folded into the batch axis) selecting ``m/G`` each, and
    concatenates.  Groups partition the point set, so the union is a
    valid spread sample; unlike exact FPS there is no cross-group
    min-distance coupling — a documented approximation used only above
    :data:`PALLAS_MAX_N` points (e.g. the 2.4M-point merge of a 50k-pt
    shape at 16x), where exact sequential FPS is intractable anyway.

    ``sort="morton"`` (default) Z-order-sorts the cloud first so the
    contiguous groups are compact spatial regions and the per-group FPS
    is *locally* exact — stratified sampling instead of G overlapping
    redundant samples.  Measured on a 400k clustered cloud at m=100k
    (benchmarks/fps_quality.py): coverage radius within ~3% of exact
    FPS vs +29%..+147% for unsorted grouping.  ``sort="none"`` keeps
    the input order (invalid points, if any, sort to the end either
    way: their key is forced to INT32_MAX).
    """
    from threepu.ops.fps_pallas import fps_pallas

    b, n, c = points.shape
    groups = -(-n // group_max)
    n_pad = -(-n // groups) * groups
    per = n_pad // groups
    m_per = -(-m // groups)

    pts = jnp.pad(points, ((0, 0), (0, n_pad - n), (0, 0)))
    mask = (jnp.arange(n_pad) < n)[None, :]
    if valid_mask is not None:
        mask = mask & jnp.pad(valid_mask, ((0, 0), (0, n_pad - n)))
    mask = jnp.broadcast_to(mask, (b, n_pad))

    if sort == "morton":
        key = jnp.where(mask, morton_codes(pts, valid_mask=mask),
                        jnp.int32(2**31 - 1))
        order = jnp.argsort(key, axis=-1).astype(jnp.int32)  # (B, n_pad)
        mask_s = jnp.take_along_axis(mask, order, axis=-1)
        # Balanced placement: the sort put all valid points in one
        # contiguous curve-ordered run; splitting THAT at fixed group
        # boundaries would starve the tail groups of valid points
        # whenever the cloud is heavily padded (bucketed merges).
        # Instead spread the valid run so every group gets
        # ceil(n_valid/G) contiguous-curve valid points, and let the
        # invalid tail fill the remaining slots in ascending order.
        i = jnp.arange(n_pad)[None, :]
        n_valid = jnp.sum(mask_s, axis=-1, keepdims=True)    # (B, 1)
        vpg = jnp.maximum(-(-n_valid // groups), 1)
        g = jnp.minimum(i // vpg, groups - 1)
        p_valid = g * per + (i - g * vpg)
        bidx = jnp.arange(b)[:, None]
        occupied = jnp.zeros((b, n_pad), jnp.int32).at[
            bidx, jnp.where(mask_s, p_valid, 0)
        ].max(mask_s.astype(jnp.int32))
        free = jnp.argsort(occupied, axis=-1, stable=True)   # zeros first
        s = jnp.clip(i - n_valid, 0, n_pad - 1)
        dest = jnp.where(mask_s, p_valid,
                         jnp.take_along_axis(free, s, axis=-1))
        order = jnp.zeros((b, n_pad), jnp.int32).at[
            bidx, dest].set(order)
        pts = jnp.take_along_axis(pts, order[..., None], axis=-2)
        mask = jnp.take_along_axis(
            jnp.broadcast_to(mask, (b, n_pad)), order, axis=-1)
    elif sort != "none":
        raise ValueError(f"unknown sort {sort!r}")

    grouped = pts.reshape(b * groups, per, c)
    gmask = mask.reshape(b * groups, per)
    # per-group FPS, groups folded into the batch axis; the Pallas
    # kernel and the XLA scan select bit-identically (tpu_checks), so
    # non-TPU backends (e.g. the restitch_groups knob under CPU tests)
    # just take the scan
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        idx = fps_pallas(grouped, m_per, valid_mask=gmask)  # (b*G, m_per)
    else:
        idx = fps_indices(grouped, m_per, valid_mask=gmask)
    offset = (jnp.arange(b * groups, dtype=jnp.int32) % groups) * per
    idx = (idx + offset[:, None]).reshape(b, groups, m_per)
    # Interleave picks round-robin across groups before truncating:
    # FPS emits picks in decreasing importance, so the m_per*G - m
    # dropped picks are the *last* pick of each group (each group loses
    # at most one) instead of the whole tail of the last group.
    idx = jnp.swapaxes(idx, 1, 2).reshape(b, groups * m_per)
    # A group that holds only padded/invalid points (possible under
    # "morton", which sorts invalid keys to the end) emits picks at
    # invalid positions; push those behind every valid pick (stable, so
    # the interleaved importance order of valid picks is preserved)
    # before truncating.
    picked_valid = jnp.take_along_axis(mask, idx, axis=-1)
    keep = jnp.argsort(~picked_valid, axis=-1, stable=True)
    idx = jnp.take_along_axis(idx, keep, axis=-1)[:, :m]
    if sort == "morton":
        idx = jnp.take_along_axis(order, idx, axis=-1)  # back to input ids
    return idx
