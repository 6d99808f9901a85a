"""Fused Pallas kernel for the DenseEdgeConv activation chain.

The eval cascade spends ~90% of wall-clock in the Level stack, and the
round-2 ablation isolated the cost to the per-neighbour activation chain
of ``DenseEdgeConv`` (reference hot loop ``network/layers.py:33-64``):
the only per-neighbour tensors in the decomposed schedule
(:meth:`threepu.models.layers.DenseEdgeConv._fused`) are
``growth_rate``-wide ``(B, N, k, G)`` activations, but under XLA every
stage round-trips HBM and the one-hot MXU gather materializes a
``(B, N*k, N)`` operand in HBM — gigabytes per cascade level, linear in
``k`` (the measured knn 8 -> -36% chunk-time scaling).

This kernel keeps the whole chain in VMEM.  Grid = (batch element,);
per program, row tiles of ``TP`` points:

1. the neighbour gather ``zn = z[idx]`` is a one-hot matmul built and
   consumed in VMEM.  The one-hot is bf16; exactness is recovered by a
   two-term hi/lo split of ``z`` (``z == hi + lo`` in f32 by
   construction), so the gathered values carry ~2^-16 relative error
   bound from the f32 accumulation — far inside the cascade parity band;
2. the dense-connectivity chain
   ``g_0 = relu(zn + pt_0)``, ``g_i = [relu](sum_j g_{i-1-j} @ W_ij +
   acc_i)`` runs on ``(TP*k, G)`` tiles with the ``(G, G)`` chain blocks
   zero-padded to ``(128, 128)`` (MXU-native, no slicing);
3. the max-pool over the neighbour axis happens in-kernel; only the
   pooled ``(N, n*G)`` stage outputs are written back.

Per-point terms (``z``, ``pt_0``, the ``acc_i``) are tiny ``(B, N, G)``
matmuls and stay in XLA.

Batch is processed in fixed ``_SEG``-element segments (padded), so every
``pallas_call`` in the cascade shares ONE kernel signature regardless of
the level's sub-patch batch — bounding the ~minute-scale axon remote
compile cost to a single instance (and keeping grids at <= 40 programs,
the observed axon limit for large surrounding programs).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: trace-time toggle for the eval-path dispatch (ablations / debugging)
ENABLED = True

#: run the kernel (interpreted) on non-TPU backends too — tests use
#: this to drive the kernel through the full cascade on CPU
FORCE = False


def enabled_for_backend() -> bool:
    return ENABLED and (jax.default_backend() == "tpu" or FORCE)

#: fixed batch-segment size == grid size of every call (axon crashes on
#: >40-program grids inside large programs; fixed size keeps ONE kernel
#: instance shape across all cascade levels)
_SEG = 40

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tile(n_pad: int) -> int:
    """Row-tile point count: bounds the (TP*k, N_pad) one-hot and the
    per-tile chain buffers (~5 MB VMEM at TP=64, k=32, N_pad=384).
    TP=128 would fill the MXU row tile but crashes the axon remote
    compiler (probed)."""
    for cand in (64, 48, 32, 16, 8):
        if n_pad % cand == 0:
            return cand
    return n_pad


#: neighbour-gather strategy inside the kernel:
#: - "onehot": bf16 one-hot matmuls with a hi/lo split of z — gathered
#:   values carry only the ~2^-16 relative error of the 2-term split.
#: - "onehot_fast": single bf16 pass (z rounded to bf16, ~4e-3
#:   relative) — half the gather FLOPs; for throughput-over-fidelity
#:   runs.
#: (A Mosaic dynamic-gather path was prototyped but the axon remote
#: compiler hard-crashes on every tpu.dynamic_gather form — see
#: benchmarks/ec_probe.py.)
GATHER_MODE = "onehot"


def _make_kernel(n: int, k: int, g: int, num_n: int, n_pad: int,
                 tp: int, gather_mode: str):
    # only tiles containing real points are computed; output rows in
    # all-padding tiles are sliced away by the caller
    n_tiles = -(-num_n // tp)
    rows = tp * k
    kg = k * g

    # NOTE on structure: this Mosaic build hard-crashes on any reshape
    # whose minor (lane) dimension is not 128-aligned (probed in
    # benchmarks/ec_probe.py / probe sweeps).  The kernel therefore
    # avoids reshapes entirely: the index block arrives j-major
    # (rows, 1) from XLA, packing (rows, G) -> (TP, K*G) is aligned
    # sublane slices + a lane concat, point terms tile by concat, and
    # the k-pool is a cyclic-roll max tree.

    def kernel(z_ref, idx_ref, pts_ref, w_ref, out_ref):
        z = z_ref[0]                                   # (N_pad, G) f32
        # hi/lo split for exact bf16 gather matmuls
        z_hi = z.astype(jnp.bfloat16)
        if gather_mode == "onehot":
            z_lo = (z - z_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        for t in range(n_tiles):
            sl = pl.ds(t * tp, tp)
            idx_t = idx_ref[0, t]                      # (K, TP) j-major
            iota_n = jax.lax.broadcasted_iota(
                jnp.int32, (k, tp, n_pad), 2)
            oh = (idx_t[:, :, None] == iota_n).astype(jnp.bfloat16)
            # minor-dim-preserving reshape (the allowed kind); row
            # r = j*TP + i keeps the j-major order
            oh = oh.reshape(rows, n_pad)
            zn = jnp.dot(oh, z_hi, preferred_element_type=jnp.float32)
            if gather_mode == "onehot":
                zn = zn + jnp.dot(oh, z_lo,
                                  preferred_element_type=jnp.float32)
            # pack (rows, G) -> (TP, K*G): row r = j*TP + i holds
            # (point i, neighbour j), so per-j blocks are aligned
            # sublane slices
            zn = jnp.concatenate(
                [zn[j * tp:(j + 1) * tp] for j in range(k)], axis=1)

            def point_term(s):
                pt = pts_ref[0, s, sl, :]              # (TP, G)
                return jnp.concatenate([pt] * k, axis=1)

            gs = [jax.nn.relu(zn + point_term(0))]
            blk = 0
            for i in range(1, n):
                y = point_term(i)
                for j in range(i):
                    w = w_ref[blk]            # (KG, KG) block-diagonal
                    blk += 1
                    y = y + jnp.dot(gs[i - 1 - j], w,
                                    preferred_element_type=jnp.float32)
                gs.append(y if i == n - 1 else jax.nn.relu(y))

            # pooled stage outputs, ordered [g_{n-1}, ..., g_0] to match
            # the decomposed schedule's reversed concat; pool over the
            # K lane-blocks by a cyclic-roll max tree (roll(kg - s) ==
            # roll(-s): block 0 accumulates the max over all K blocks)
            for s in range(n):
                x = gs[n - 1 - s]
                sh = g
                while sh < kg:
                    x = jnp.maximum(x, pltpu.roll(x, kg - sh, 1))
                    sh *= 2
                out_ref[0, s, sl, :] = x[:, :g]

    return kernel


@partial(jax.jit, static_argnames=("n", "g", "gather_mode", "interpret"))
def _ec_chain_call(z: jax.Array, idx: jax.Array, pts: jax.Array,
                   wblk: jax.Array, n: int, g: int, gather_mode: str,
                   interpret: bool) -> jax.Array:
    """One fixed-size segment: z (S, N, G), idx (S, N, K),
    pts (S, n, N, G), wblk (n*(n-1)/2, G, G) -> pooled (S, n, N, G)."""
    s, num_n, _ = z.shape
    k = idx.shape[-1]
    kg = k * g
    n_pad = _round_up(num_n, _LANE)
    tp = _pick_tile(n_pad)
    n_tiles = -(-num_n // tp)
    rows = tp * k

    # HBM layouts keep G at its natural width (12): Mosaic lane-pads
    # inside VMEM for free, while padding in HBM would inflate the
    # kernel's memory traffic ~10x (measured as a net pipeline LOSS)
    z_p = jnp.pad(z.astype(jnp.float32),
                  ((0, 0), (0, n_pad - num_n), (0, 0)))
    # the kernel consumes indices j-major per row tile — (S, n_tiles,
    # K, TP), so its one-hot rows come out j-major (row j*TP+i =
    # (point i, neighbour j)) and packing is aligned sublane slices;
    # the rearrangement is free here in XLA
    cover = n_tiles * tp
    idx_jm = jnp.pad(idx.astype(jnp.int32),
                     ((0, 0), (0, cover - num_n), (0, 0)))
    idx_jm = idx_jm.reshape(s, n_tiles, tp, k).transpose(0, 1, 3, 2)
    pts_p = jnp.pad(pts.astype(jnp.float32),
                    ((0, 0), (0, 0), (0, n_pad - num_n), (0, 0)))
    ncw = max(n * (n - 1) // 2, 1)
    # chain weights expand to block-diagonal (K*G, K*G) so the in-kernel
    # matmuls run on the packed (TP, K*G) layout with dense lanes
    if wblk.shape[0]:
        eye_k = jnp.eye(k, dtype=jnp.float32)
        w_p = jax.vmap(lambda w: jnp.kron(eye_k, w.astype(jnp.float32))
                       )(wblk)
    else:
        w_p = jnp.zeros((ncw, kg, kg), jnp.float32)

    z_spec = pl.BlockSpec((1, n_pad, g), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((1, n_tiles, k, tp), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    pts_spec = pl.BlockSpec((1, n, n_pad, g), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((ncw, kg, kg), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, n, n_pad, g), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    chain_mm = n * (n - 1) // 2
    passes = 2 if gather_mode == "onehot" else 1
    out = pl.pallas_call(
        _make_kernel(n, k, g, num_n, n_pad, tp, gather_mode),
        grid=(s,),
        in_specs=[z_spec, idx_spec, pts_spec, w_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((s, n, n_pad, g), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=s * (passes * 2 * cover * k * n_pad * g
                       + 2 * chain_mm * cover * kg * kg),
            bytes_accessed=s * n_pad * 4 * (g * (2 * n + 1) + k),
            transcendentals=0),
        interpret=interpret,
    )(z_p, idx_jm, pts_p, w_p)
    return out[:, :, :num_n, :]


def edge_conv_chain_pallas(z: jax.Array, idx: jax.Array,
                           pts: Sequence[jax.Array],
                           chain_w: Sequence[jax.Array],
                           n: int, g: int) -> jax.Array:
    """Fused DenseEdgeConv chain (see module docstring).

    Args:
      z: ``(B, N, G)`` gather source (``x @ W_d``).
      idx: ``(B, N, K)`` neighbour indices.
      pts: ``n`` per-point additive terms ``(B, N, G)`` —
        ``pts[0] = x @ (W_c - W_d) + b_0``, ``pts[i] = x @ W_i[x rows]
        + b_i``.
      chain_w: the ``n*(n-1)/2`` chain blocks ``(G, G)``, ordered by
        stage then position: block ``(i, j)`` multiplies ``g_{i-1-j}``.
      n, g: dense_n / growth_rate (static).

    Returns:
      ``(B, N, n*G)`` pooled stage outputs ordered
      ``[g_{n-1}, ..., g_0]`` (the caller concatenates ``x``).
    """
    b, num_n, _ = z.shape
    pts_a = jnp.stack(pts, axis=1)                    # (B, n, N, G)
    wblk = (jnp.stack(chain_w, axis=0) if chain_w
            else jnp.zeros((0, g, g), z.dtype))
    gather_mode = GATHER_MODE
    interpret = jax.default_backend() != "tpu"

    outs = []
    for s0 in range(0, b, _SEG):
        s1 = min(s0 + _SEG, b)
        z_s, idx_s, pts_s = z[s0:s1], idx[s0:s1], pts_a[s0:s1]
        if s1 - s0 < _SEG:
            # pad ragged segments so every call in every cascade level
            # shares ONE kernel shape (one ~minute-scale axon compile)
            pad = _SEG - (s1 - s0)
            z_s = jnp.pad(z_s, ((0, pad), (0, 0), (0, 0)))
            idx_s = jnp.pad(idx_s, ((0, pad), (0, 0), (0, 0)))
            pts_s = jnp.pad(pts_s, ((0, pad), (0, 0), (0, 0), (0, 0)))
        pooled = _ec_chain_call(z_s, idx_s, pts_s, wblk, n, g,
                                gather_mode, interpret)
        outs.append(pooled[:s1 - s0])
    pooled = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    # (B, n, N, G) -> (B, N, n*G) stage-major concat
    return jnp.moveaxis(pooled, 1, 2).reshape(b, num_n, n * g)
