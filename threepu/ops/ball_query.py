"""Ball query.

Capability parity with the reference CUDA kernel
(``sampling/sampling_cuda.cu:269-317``): for each query point, collect up
to ``nsample`` indices of points within ``radius``, scanning points in
index order; slots after the first hit are pre-filled with the first hit's
index; if nothing is within the radius all slots stay 0.  (The reference
binds but never calls this op — it is part of the public surface via
``sampling.ball_query``, ``sampling/sampling.cpp:83-89``.)

TPU design: dense distance matrix (MXU) + rank-by-cumsum instead of a
sequential scan — identical output, fully vectorised.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from threepu.ops.distances import pairwise_dist2


def ball_query(radius: float, nsample: int, points: jax.Array,
               queries: jax.Array,
               valid_mask: Optional[jax.Array] = None) -> jax.Array:
    """Args:
      radius: ball radius.
      nsample: max neighbours per query (static).
      points: ``(B, N, 3)``.
      queries: ``(B, M, 3)``.
      valid_mask: optional ``(B, N)``; invalid points never match.

    Returns:
      int32 ``(B, M, nsample)`` indices, reference fill semantics.
    """
    d = pairwise_dist2(queries, points)                      # (B, M, N)
    within = d < jnp.asarray(radius, d.dtype) ** 2
    if valid_mask is not None:
        within = within & valid_mask[:, None, :]

    # rank[j] = number of earlier in-ball points; a point fills slot rank
    # iff rank < nsample.
    rank = jnp.cumsum(within, axis=-1) - 1                   # (B, M, N)
    n = points.shape[-2]
    col = jnp.arange(n, dtype=jnp.int32)

    any_hit = jnp.any(within, axis=-1, keepdims=True)        # (B, M, 1)
    first_hit = jnp.argmax(within, axis=-1).astype(jnp.int32)  # (B, M)

    slot_of = jnp.where(within, rank, n)                     # (B, M, N)
    # scatter point index -> slot
    out = jnp.full(d.shape[:-1] + (nsample + 1,), -1, jnp.int32)
    b_idx = jnp.arange(d.shape[0])[:, None, None]
    m_idx = jnp.arange(d.shape[1])[None, :, None]
    slot_clip = jnp.minimum(slot_of, nsample)                # overflow slot
    out = out.at[b_idx, m_idx, slot_clip].max(
        jnp.where(within, col[None, None, :], -1))
    out = out[..., :nsample]
    fill = jnp.where(any_hit, first_hit[..., None], 0)
    return jnp.where(out >= 0, out, fill).astype(jnp.int32)
