"""Point-cloud normalization (centroid + max-radius scaling).

Equivalent of ``network/operations.py:12-30`` and the numpy twin
``utils/pc_utils.py:11-25``: subtract the per-cloud centroid, divide by
the furthest point's 2-norm.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def normalize_point_batch_cl(pc: jax.Array) -> Tuple[jax.Array, jax.Array,
                                                     jax.Array]:
    """Channels-last core: ``pc (..., N, C)`` ->
    ``(normalized, centroid (..., 1, C), radius (..., 1, 1))``."""
    centroid = jnp.mean(pc, axis=-2, keepdims=True)
    pc = pc - centroid
    radius = jnp.max(
        jnp.sqrt(jnp.sum(pc * pc, axis=-1, keepdims=True)),
        axis=-2, keepdims=True)
    return pc / radius, centroid, radius


def normalize_point_batch(pc: jax.Array, NCHW: bool = True):
    """Reference-compatible wrapper (``network/operations.py:12``):
    ``(B, 3, N)`` if NCHW else ``(B, N, 3)``; returns (pc, centroid,
    furthest_distance) in the same layout."""
    if NCHW:
        out, centroid, radius = normalize_point_batch_cl(
            jnp.swapaxes(pc, -1, -2))
        return (jnp.swapaxes(out, -1, -2),
                jnp.swapaxes(centroid, -1, -2), radius)
    return normalize_point_batch_cl(pc)
