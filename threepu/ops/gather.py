"""Index gathering with scatter-add gradients.

Capability twin of the reference CUDA ``gather_points`` forward/backward
(``sampling/sampling_cuda.cu:28-100``, autograd wrapper
``network/operations.py:219-266``).  On TPU a native XLA gather is
optimal and already differentiable — its transpose is a deterministic
scatter-add, replacing the CUDA ``atomicAdd``.  Kept as a named op (with
an explicit ``custom_vjp`` mirroring the reference API contract: no
gradient flows to ``idx``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gather_points(features: jax.Array, idx: jax.Array) -> jax.Array:
    """``out[b, c, i] = features[b, c, idx[b, i]]``.

    Args:
      features: ``(B, C, N)``.
      idx: ``(B, M)`` integer indices.

    Returns:
      ``(B, C, M)``.
    """
    return jnp.take_along_axis(features, idx[:, None, :], axis=2)


def _gather_fwd(features, idx):
    return gather_points(features, idx), (idx, features.shape)


def _gather_bwd(res, g):
    idx, shape = res
    grad = jnp.zeros(shape, g.dtype)
    grad = grad.at[
        jnp.arange(shape[0])[:, None, None],
        jnp.arange(shape[1])[None, :, None],
        idx[:, None, :],
    ].add(g)
    return grad, None


gather_points.defvjp(_gather_fwd, _gather_bwd)


def gather_nd(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Channels-last gather: ``points (B, N, C)``, ``idx (B, M)`` ->
    ``(B, M, C)``.  Differentiable natively."""
    return jnp.take_along_axis(points, idx[..., None], axis=-2)


def batched_gather(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather with arbitrary trailing index shape and NO broadcast
    blow-up: ``points (..., M, C)``, ``idx (..., X1, ..., Xk)`` ints in
    [0, M) -> ``(..., X1, ..., Xk, C)``.

    The naive ``take_along_axis(points[..., None, :, :], idx[..., None],
    axis=-2)`` pattern materializes a ``(..., X, M, C)`` broadcast under
    XLA (a 60GB allocation at cascade level 4); flattening the index
    axes first keeps it a true gather.
    """
    batch_shape = points.shape[:-2]
    extra = idx.shape[len(batch_shape):]
    flat = idx.reshape(batch_shape + (-1,))
    out = jnp.take_along_axis(points, flat[..., None], axis=-2)
    return out.reshape(batch_shape + extra + (points.shape[-1],))
