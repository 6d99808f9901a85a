"""Pairwise distance primitives.

The reference computes kNN through a dense squared-distance matrix in the
matmul form ``|A|^2 - 2 A B^T + |B|^2`` (reference:
``network/operations.py:151-162``).  That form is already the natural TPU
design — the inner product rides the MXU — so it is the core primitive
here.  Everything that needs distances (kNN, ball query, patch grouping)
goes through :func:`pairwise_dist2`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_dist2(a: jax.Array, b: jax.Array,
                   precision=None) -> jax.Array:
    """Squared euclidean distance matrix between two point/feature sets.

    Args:
      a: ``(..., N, C)`` query set.
      b: ``(..., M, C)`` reference set.
      precision: matmul precision for the inner product; defaults to
        HIGHEST — geometry needs it (without it the TPU MXU decomposes
        f32 matmuls into bf16 passes and NN ranking breaks).  Heuristic
        feature-space graphs may pass HIGH (3-pass) for ~2x matmul
        speed.

    Returns:
      ``(..., N, M)`` squared distances.  Uses the expanded matmul form so
      the ``N x C @ C x M`` contraction maps onto the MXU; accumulation is
      forced to float32.
    """
    # Accumulate in at least f32 (bf16 inputs upcast; f64 stays f64).
    acc = jnp.promote_types(a.dtype, jnp.float32)
    r_a = jnp.sum(a * a, axis=-1, keepdims=True)          # (..., N, 1)
    r_b = jnp.sum(b * b, axis=-1, keepdims=True)          # (..., M, 1)
    inner = jnp.matmul(a, jnp.swapaxes(b, -1, -2),
                       preferred_element_type=acc,
                       precision=precision or jax.lax.Precision.HIGHEST)
    d = r_a.astype(acc) - 2.0 * inner + jnp.swapaxes(r_b, -1, -2).astype(acc)
    return d.astype(jnp.promote_types(a.dtype, jnp.float32))


def direct_dist2(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared distances via direct subtraction: ``(..., N, M)``.

    Exact for equality testing (``d == 0`` iff rows identical), unlike the
    matmul expansion which suffers catastrophic cancellation.  Memory is
    ``N*M*C`` so only use on small sets.
    """
    diff = a[..., :, None, :] - b[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


#: direct-comparison cutoff: sorts are pathological for the axon
#: remote compiler (~+240 s per sorted instance measured), and the
#: fused O(N^2 C) compare stays a few ms up to ~8k points
_DIRECT_MAX_N = 8192
#: element budget for the direct path's (B, N, N, C) intermediate —
#: the single-shape cutoff above at C=3; batched calls that would
#: exceed it (multi-GB if XLA materializes the broadcast) take the
#: sort path instead
_DIRECT_BUDGET = _DIRECT_MAX_N * _DIRECT_MAX_N * 3


def duplicate_mask(points: jax.Array) -> jax.Array:
    """Mark rows that exactly duplicate an earlier row.

    On-device replacement for the reference's host ``np.unique`` round trip
    (reference: ``network/operations.py:193-204``): with
    ``return_index=True`` numpy keeps the *first* occurrence of each
    distinct row, so every row equal to some earlier row is a duplicate.

    Two paths:

    - ``N <= _DIRECT_MAX_N`` (8192): one fused (N, N, C) comparison — tiny HLO, fast
      compile, a few ms at these sizes.
    - large ``N``: three stable argsort passes (z, then y, then x —
      stable sorting yields exact lexicographic (x, y, z,
      original-index) order, so equal rows are adjacent with the
      smallest original index first), one adjacent exact-equality
      compare, scatter back.  O(N log N) — replaces the old chunked
      O(N^2 C) comparison map, which cost ~38 ms at the level-4 eval
      merge (N≈12k) and took the eval headline from 34.4k to 51.2k
      pts/sec.  Sorts are compile-heavy through the axon remote
      compiler, hence the small-N cutoff.

    Args:
      points: ``(..., N, C)``; any C (keys are built per trailing
        column, sorted last-column-first).

    Returns:
      boolean ``(..., N)``; True where the row duplicates an earlier row.
    """
    *batch, n, c = points.shape
    flat = points.reshape((-1, n, c)).astype(jnp.float32)
    b = flat.shape[0]

    if n <= _DIRECT_MAX_N and b * n * n * c <= _DIRECT_BUDGET:
        col_idx = jnp.arange(n)
        eq = jnp.all(flat[:, :, None, :] == flat[:, None, :, :], axis=-1)
        earlier = col_idx[None, :] < col_idx[:, None]
        return jnp.any(eq & earlier, axis=-1).reshape(*batch, n)

    order = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    rows = flat
    # stable sorts from the least-significant column up; ties keep
    # input (= original index) order, giving the np.unique tie-break.
    # Sorting the float values directly is a valid total order here
    # (point data has no NaNs; -0.0 compares equal to +0.0, so IEEE
    # duplicates still land adjacent).
    for col in range(c - 1, -1, -1):
        perm = jnp.argsort(rows[..., col], axis=-1, stable=True)
        order = jnp.take_along_axis(order, perm, axis=-1)
        rows = jnp.take_along_axis(rows, perm[..., None], axis=-2)
    # adjacent exact equality on the float values themselves
    eq_prev = jnp.all(rows[:, 1:] == rows[:, :-1], axis=-1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((b, 1), bool), eq_prev], axis=1)
    bidx = jnp.arange(b)[:, None]
    mask = jnp.zeros((b, n), bool).at[bidx, order].set(dup_sorted)
    return mask.reshape(*batch, n)
