"""Pallas TPU kernel for furthest point sampling.

TPU-native re-design of the reference CUDA kernel
(``sampling/sampling_cuda.cu:103-174``).  The CUDA version caches the
first 512 points in shared memory and does a block-wide tree max
reduction per step; here the *entire* point set, the min-distance carry
and the selection field live in VMEM for the whole kernel, so each of the
``m`` sequential steps is a handful of vectorised passes over ``(S, 128)``
tiles with zero HBM traffic.

Selection order is recorded as a 1-based iteration number per point
(avoiding per-step dynamic scalar stores); the caller recovers the
ordered index list with one stable argsort.  Tie-breaking: lowest linear
index, identical to ``jnp.argmax`` in :func:`threepu.ops.fps.fps_indices`.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 8
_INIT_DIST = 1e10
_BIG_I32 = 2**30  # plain int: a jnp scalar would be a captured constant


def _fps_kernel(s, seed_ref, m_ref, xs_ref, ys_ref, zs_ref, temp0_ref,
                iter_ref, temp_ref):
    b = pl.program_id(0)
    xs = xs_ref[0]
    ys = ys_ref[0]
    zs = zs_ref[0]
    temp_ref[:] = temp0_ref[0]

    rows = jax.lax.broadcasted_iota(jnp.int32, (s, _LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, _LANES), 1)
    lin = rows * _LANES + cols
    cols_row = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    # winner bookkeeping touches ONE (1, 128) sublane row, not the whole
    # field: at headline sizes (N=240k, m=80k picks for the final
    # restitch) the full-field coords_of / iter-stamp formulation spent
    # over half of each pick's VMEM traffic extracting three scalars and
    # writing one element
    def coords_of(i):
        row = i // _LANES
        sel = (cols_row == i % _LANES).astype(jnp.float32)
        return (jnp.sum(xs_ref[0, pl.ds(row, 1), :] * sel),
                jnp.sum(ys_ref[0, pl.ds(row, 1), :] * sel),
                jnp.sum(zs_ref[0, pl.ds(row, 1), :] * sel))

    def stamp(i, val):
        row = i // _LANES
        old = iter_ref[0, pl.ds(row, 1), :]
        iter_ref[0, pl.ds(row, 1), :] = jnp.where(
            cols_row == i % _LANES, val, old)

    seed = seed_ref[b]
    iter_ref[0] = jnp.zeros((s, _LANES), jnp.int32)
    stamp(seed, jnp.int32(1))

    def body(j, carry):
        cx, cy, cz = carry
        dx = xs - cx
        dy = ys - cy
        dz = zs - cz
        d = dx * dx + dy * dy + dz * dz
        t = jnp.minimum(temp_ref[:], d)
        temp_ref[:] = t
        mx = jnp.max(t)
        win = jnp.min(jnp.where(t == mx, lin, _BIG_I32))
        stamp(win, j + 1)
        return coords_of(win)

    # the pick count is a PREFETCHED SCALAR, not a kernel constant: all
    # callers that share a padded point-set shape share one kernel
    # instance (one ~minute-scale axon compile) while each pays only
    # its real sequential pick cost (the loop bound is dynamic)
    jax.lax.fori_loop(1, m_ref[0], body, coords_of(seed))


@partial(jax.jit, static_argnames=("m",))
def fps_pallas(points: jax.Array, m: int,
               valid_mask: Optional[jax.Array] = None,
               m_eff=None) -> jax.Array:
    """FPS indices via the Pallas kernel.  Same contract as
    :func:`threepu.ops.fps.fps_indices`: ``points (B, N, 3)`` -> ``(B, m)``
    int32 in selection order, seeded at the first valid index.

    ``m_eff`` (optional traced scalar <= m) bounds the sequential pick
    loop dynamically: rows ``m_eff:`` of the result are arbitrary
    unselected indices.  Callers that over-pick only to share one kernel
    instance across padded shapes pass their real count here so the
    padding costs no sequential steps.
    """
    from threepu.ops.fps import sanitize_points

    b, n, c = points.shape
    assert c == 3, "fps_pallas is implemented for 3D points"
    points = points.astype(jnp.float32)
    # non-finite points become invalid + zeroed, like fps_indices
    # (a NaN coordinate would make jnp.max(t) NaN in the kernel body
    # and no point would ever match the winner select)
    points, valid_mask = sanitize_points(points, valid_mask)
    n_pad = -(-n // (_LANES * _SUBLANES)) * (_LANES * _SUBLANES)
    s = n_pad // _LANES

    planes = jnp.moveaxis(points, -1, 1)                      # (B, 3, N)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, n_pad - n)))
    xs, ys, zs = (planes[:, i].reshape(b, s, _LANES) for i in range(3))

    temp0 = jnp.full((b, n), _INIT_DIST, jnp.float32)
    temp0 = jnp.where(valid_mask, temp0, -jnp.inf)
    seed = jnp.argmax(valid_mask, axis=-1).astype(jnp.int32)
    temp0 = jnp.pad(temp0, ((0, 0), (0, n_pad - n)),
                    constant_values=-jnp.inf).reshape(b, s, _LANES)

    plane_spec = pl.BlockSpec((1, s, _LANES), lambda i, *_: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    m_dyn = jnp.asarray(m if m_eff is None else m_eff,
                        jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[plane_spec] * 4,
        out_specs=pl.BlockSpec((1, s, _LANES), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((s, _LANES), jnp.float32)],
    )
    iter_field = pl.pallas_call(
        partial(_fps_kernel, s),
        out_shape=jax.ShapeDtypeStruct((b, s, _LANES), jnp.int32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=22 * m * n_pad, bytes_accessed=5 * n_pad * 4,
            transcendentals=0),
    )(seed, m_dyn, xs, ys, zs, temp0)

    iter_field = iter_field.reshape(b, n_pad)[:, :n]
    order_key = jnp.where(iter_field > 0, iter_field, _BIG_I32)
    return jnp.argsort(order_key, axis=-1)[:, :m].astype(jnp.int32)
