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
