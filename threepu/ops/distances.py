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


def duplicate_mask(points: jax.Array, *, chunk: int = 256) -> jax.Array:
    """Mark rows that exactly duplicate an earlier row.

    On-device replacement for the reference's host ``np.unique`` round trip
    (reference: ``network/operations.py:193-204``): with
    ``return_index=True`` numpy keeps the *first* occurrence of each
    distinct row, so every row equal to some earlier row is a duplicate.

    Args:
      points: ``(..., N, C)``.
      chunk: row-chunk size bounding the ``chunk x N x C`` comparison
        buffer.

    Returns:
      boolean ``(..., N)``; True where the row duplicates an earlier row.
    """
    *batch, n, c = points.shape
    col_idx = jnp.arange(n)
    if n * n * c <= 64 * 1024 * 1024:
        # direct broadcast path: (..., N, N, C) comparison buffer
        eq = jnp.all(points[..., :, None, :] == points[..., None, :, :],
                     axis=-1)
        earlier = col_idx[None, :] < col_idx[:, None]
        return jnp.any(eq & earlier, axis=-1)

    flat = points.reshape((-1, n, c))
    pad = (-n) % chunk
    n_pad = n + pad

    def one_batch(pts):
        padded = jnp.pad(pts, ((0, pad), (0, 0)))

        def one_chunk(start_row):
            rows = jax.lax.dynamic_slice(padded, (start_row, 0), (chunk, c))
            row_idx = start_row + jnp.arange(chunk)
            eq = jnp.all(rows[:, None, :] == pts[None, :, :], axis=-1)
            earlier = col_idx[None, :] < row_idx[:, None]
            return jnp.any(eq & earlier, axis=-1)

        starts = jnp.arange(n_pad // chunk) * chunk
        out = jax.lax.map(one_chunk, starts)          # (n_chunks, chunk)
        return out.reshape(-1)[:n]

    mask = jax.lax.map(one_batch, flat)
    return mask.reshape(*batch, n)
