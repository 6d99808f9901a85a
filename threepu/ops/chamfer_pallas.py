"""Pallas TPU kernel for one-way nearest-neighbour distance.

TPU-native re-design of the reference ``NmDistanceKernel``
(``losses/nmdistance_cuda.cu:11-133``): where the CUDA kernel tiles set
B into 512-point shared-memory chunks with a manually unrolled inner
loop, here the query block and the full reference set live in VMEM and
the kernel sweeps reference tiles with a running (min, argmin) carry —
exact squared distances via direct subtraction (no matmul-form
cancellation), zero HBM traffic inside the sweep.

Used by :func:`threepu.ops.chamfer.nn_distance` for large clouds on
TPU; the chunked XLA path remains the CPU/small-size fallback and the
backward pass is shared (gradients only need the saved argmin indices).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 256      # query rows per program
_TM = 2048     # reference tile swept per loop iteration
_BIG = 1e30   # plain floats: jnp scalars become captured constants
_BIG_I = 2**30


def _nn_kernel(m_pad, ax_ref, ay_ref, az_ref, bx_ref, by_ref, bz_ref,
               dist_ref, idx_ref):
    ax = ax_ref[0]            # (TN, 1)
    ay = ay_ref[0]
    az = az_ref[0]

    n_tiles = m_pad // _TM
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (_TN, _TM), 1)

    def body(t, carry):
        best, besti = carry
        off = t * _TM
        bx = bx_ref[0, :, pl.ds(off, _TM)]   # (1, TM)
        by = by_ref[0, :, pl.ds(off, _TM)]
        bz = bz_ref[0, :, pl.ds(off, _TM)]
        dx = ax - bx                          # (TN, TM)
        dy = ay - by
        dz = az - bz
        d = dx * dx + dy * dy + dz * dz
        tmin = jnp.min(d, axis=1, keepdims=True)          # (TN, 1)
        targ = jnp.min(jnp.where(d == tmin, j_iota + off, _BIG_I),
                       axis=1, keepdims=True)
        take = tmin < best
        return (jnp.where(take, tmin, best),
                jnp.where(take, targ, besti))

    best0 = jnp.full((_TN, 1), _BIG, jnp.float32)
    besti0 = jnp.zeros((_TN, 1), jnp.int32)
    best, besti = jax.lax.fori_loop(0, n_tiles, body, (best0, besti0))
    dist_ref[0] = best
    idx_ref[0] = besti


@partial(jax.jit)
def nn_one_way_pallas(a: jax.Array, b: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
    """Nearest neighbour in ``b`` for each point of ``a``.

    a: (B, N, 3), b: (B, M, 3) float32 -> (dist (B, N) f32, idx (B, N)
    int32).  Exact (direct-subtraction) squared distances; ties resolve
    to the lowest index, matching ``jnp.argmin``.
    """
    bsz, n, _ = a.shape
    m = b.shape[1]
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)

    n_pad = -(-n // _TN) * _TN
    m_pad = -(-m // _TM) * _TM

    # coordinate planes; padded reference points sit at +inf-ish distance
    ap = jnp.pad(a, ((0, 0), (0, n_pad - n), (0, 0)))
    bp = jnp.pad(b, ((0, 0), (0, m_pad - m), (0, 0)),
                 constant_values=1e15)
    a_planes = [ap[..., i][..., None] for i in range(3)]    # (B, Np, 1)
    b_planes = [bp[..., i][:, None, :] for i in range(3)]   # (B, 1, Mp)

    a_spec = pl.BlockSpec((1, _TN, 1), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, 1, m_pad), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, _TN, 1), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    dist, idx = pl.pallas_call(
        partial(_nn_kernel, m_pad),
        grid=(bsz, n_pad // _TN),
        in_specs=[a_spec] * 3 + [b_spec] * 3,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((bsz, n_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, n_pad, 1), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * n_pad * m_pad * bsz,
            bytes_accessed=(n_pad + m_pad) * 12 * bsz,
            transcendentals=0),
    )(*a_planes, *b_planes)
    return dist[:, :n, 0], idx[:, :n, 0]
