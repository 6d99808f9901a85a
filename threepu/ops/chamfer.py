"""Bidirectional nearest-neighbour distance (the Chamfer kernel).

TPU-native equivalent of the reference CUDA ``nmdistance`` extension:

- forward (``losses/nmdistance_cuda.cu:11-153``): for every point of set
  A the squared distance to (and index of) its nearest point in set B,
  and vice versa.  Here: tiled distance-matrix min-reduction where the
  inner product rides the MXU; row chunking bounds the materialised
  ``chunk x M`` buffer so arbitrarily large clouds fit in HBM.
- backward (``losses/nmdistance_cuda.cu:154-194``): re-derived from the
  saved argmin indices; the CUDA ``atomicAdd`` accumulation becomes a
  deterministic XLA scatter-add.

The reference autograd wrapper (``network/model_loss.py:5-28``) contains
a latent NameError (``d_dist1``) in its backward; this implementation
provides the *intended* gradients (verified by finite differences in
``tests/test_chamfer.py``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from threepu.ops.distances import pairwise_dist2

Array = jax.Array


def _nn_one_way(a: Array, b: Array, chunk: int) -> Tuple[Array, Array]:
    """Nearest neighbour in ``b`` for each point of ``a``.

    a: (B, N, C), b: (B, M, C) -> dist (B, N) f32, idx (B, N) i32.
    Dispatches to the Pallas kernel on TPU for large 3D clouds (the
    reference set must fit VMEM); otherwise scans row-chunks of ``a``
    so peak memory is ``B * chunk * M``.
    """
    n, m = a.shape[-2], b.shape[-2]
    if (a.shape[-1] == 3 and jax.default_backend() == "tpu"
            and n * m >= 1 << 20 and m <= 400_000):
        from threepu.ops.chamfer_pallas import nn_one_way_pallas
        return nn_one_way_pallas(a, b)
    bsz, n, c = a.shape
    pad = (-n) % chunk
    a_pad = jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
    n_chunks = (n + pad) // chunk
    a_chunks = a_pad.reshape(bsz, n_chunks, chunk, c)

    def one(chunk_pts):  # (B, chunk, C)
        d = pairwise_dist2(chunk_pts, b)                  # (B, chunk, M)
        return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)

    dists, idxs = jax.lax.map(one, jnp.swapaxes(a_chunks, 0, 1))
    dists = jnp.swapaxes(dists, 0, 1).reshape(bsz, n + pad)[:, :n]
    idxs = jnp.swapaxes(idxs, 0, 1).reshape(bsz, n + pad)[:, :n]
    return dists, idxs


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def nn_distance(xyz1: Array, xyz2: Array, chunk: int = 2048):
    """Bidirectional NN distance.

    Args:
      xyz1: ``(B, N, 3)``.
      xyz2: ``(B, M, 3)``.
      chunk: row-chunk bounding peak memory (static).

    Returns:
      ``(dist1 (B,N), idx1 (B,N), dist2 (B,M), idx2 (B,M))`` — squared
      distances; indices are non-differentiable, matching the reference
      contract (``network/model_loss.py:17``).
    """
    d1, i1 = _nn_one_way(xyz1, xyz2, chunk)
    d2, i2 = _nn_one_way(xyz2, xyz1, chunk)
    return d1, i1, d2, i2


def _nn_fwd(xyz1, xyz2, chunk):
    out = nn_distance(xyz1, xyz2, chunk)
    d1, i1, d2, i2 = out
    return out, (xyz1, xyz2, i1, i2)


def _nn_bwd(chunk, res, grads):
    xyz1, xyz2, i1, i2 = res
    g1, _, g2, _ = grads
    g1 = g1[..., None]
    g2 = g2[..., None]
    nn1 = jnp.take_along_axis(xyz2, i1[..., None], axis=-2)  # (B, N, 3)
    nn2 = jnp.take_along_axis(xyz1, i2[..., None], axis=-2)  # (B, M, 3)
    diff1 = xyz1 - nn1
    diff2 = xyz2 - nn2

    grad1 = 2.0 * g1 * diff1
    grad2 = 2.0 * g2 * diff2

    bidx = jnp.arange(xyz1.shape[0])[:, None]
    # direction-2 rows scatter into xyz1 (deterministic segment add)
    grad1 = grad1.at[bidx, i2, :].add(-grad2)
    grad2 = grad2.at[bidx, i1, :].add(-2.0 * g1 * diff1)
    return grad1, grad2


nn_distance.defvjp(_nn_fwd, _nn_bwd)


def nndistance(xyz1: Array, xyz2: Array):
    """Reference-compatible alias (``network/model_loss.py:30``)."""
    return nn_distance(xyz1, xyz2)


def self_nn_dist2(points: Array, chunk: int = 2048) -> Array:
    """Distance to each point's nearest *other* point: ``(B, N)``.

    Purpose-built for the outlier test (``upsampler.py:63-68``: NN
    distance >= 5x mean -> outlier).  The naive route — self-kNN with
    k=2 — materializes the full ``N x N`` matrix and a giant top-k; this
    is a chunked masked min, O(chunk*N) memory and no sort.
    """
    bsz, n, c = points.shape
    pad = (-n) % chunk
    p_pad = jnp.pad(points, ((0, 0), (0, pad), (0, 0)))
    n_chunks = (n + pad) // chunk
    chunks = jnp.swapaxes(p_pad.reshape(bsz, n_chunks, chunk, c), 0, 1)
    row_ids = jnp.arange(n + pad).reshape(n_chunks, chunk)
    col_ids = jnp.arange(n)

    def one(args):
        rows, ids = args                                # (B, chunk, C)
        d = pairwise_dist2(rows, points)                # (B, chunk, N)
        self_mask = ids[None, :, None] == col_ids[None, None, :]
        d = jnp.where(self_mask, jnp.inf, d)
        return jnp.min(d, axis=-1)

    out = jax.lax.map(one, (chunks, row_ids))           # (n_chunks, B, chunk)
    return jnp.swapaxes(out, 0, 1).reshape(bsz, n + pad)[:, :n]
