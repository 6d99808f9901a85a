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

#: trace-time toggle for the eval-path dispatch.  Default OFF: measured
#: end-to-end on the v5e headline pipeline (round 3), the kernel is a
#: net loss vs XLA's fused schedule on BOTH axes — steady state 1.708
#: vs 1.593 s/shape and time-to-first-shape 809 vs 69.5 s (each Mosaic
#: instance pays a ~minute-scale axon remote compile).  The kernel is
#: kept (with CPU-interpret parity tests and an on-chip check in
#: benchmarks/tpu_checks.py) as the measured record of the approach:
#: Mosaic's per-op overhead makes the fused chain op-count-bound at
#: G=12, and the one-hot gather's 12->128 lane padding keeps the MXU
#: work ~10x the algorithmic FLOPs — see benchmarks/RESULTS.md round 3.
ENABLED = False

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
    # benchmarks/ec_probe.py / probe sweeps).  Beyond crashes, the
    # kernel is op-COUNT bound, not FLOP bound (measured ~63 us/tile vs
    # ~3 us of MXU work): every per-tile op carries ~0.5-1 us of fixed
    # overhead, so the packed (TP, K*G) layout's 32-slice lane concats
    # (zn pack + 3 point-term tiles = ~128 ops/tile) dominated runtime.
    # This body therefore stays in the j-major (rows, G) layout end to
    # end — no packing — and replaces every K-iteration loop with a
    # single op:
    #   * point terms tile to rows via a constant tile(I_TP) one-hot
    #     matmul (exact: one unit product per output row);
    #   * chain matmuls run directly on (rows, G) with Mosaic padding
    #     G -> 128 lanes internally;
    #   * the k-pool is a cyclic-roll max tree over the SUBLANE axis
    #     (j-major rows: pooled row i = max_j x[j*TP + i]).

    def kernel(z_ref, idx_ref, pts_ref, w_ref, out_ref):
        z = z_ref[0]                                   # (N_pad, G) f32
        # hi/lo split for exact bf16 gather matmuls
        z_hi = z.astype(jnp.bfloat16)
        if gather_mode == "onehot":
            z_lo = (z - z_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        # constant row-tiling operand: tile_mat[j*TP + i, i] = 1.
        # Augmenting the one-hot / chain LHS with it folds the per-point
        # additive term into the same matmul (exact: unit products), so
        # no (rows, G) add or separate tiling op ever materializes.
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (rows, tp), 0)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (rows, tp), 1)
        tile_bf = (iota_r % tp == iota_c).astype(jnp.bfloat16)
        tile_f32 = tile_bf.astype(jnp.float32)

        def kpool(x):
            """Max over the K j-major row blocks by a slice-halving
            tree: touches 2x the tensor instead of the roll tree's
            log2(K)x (all slice offsets are TP-sublane aligned).
            Non-power-of-2 K falls back to the cyclic-roll tree."""
            if k & (k - 1) == 0:
                h = rows // 2
                while h >= tp:
                    x = jnp.maximum(x[:h], x[h:2 * h])
                    h //= 2
                return x
            sh = tp
            while sh < rows:
                x = jnp.maximum(x, pltpu.roll(x, rows - sh, 0))
                sh *= 2
            return x[:tp]

        for t in range(n_tiles):
            sl = pl.ds(t * tp, tp)
            idx_t = idx_ref[0, t]                      # (K, TP) j-major
            iota_n = jax.lax.broadcasted_iota(
                jnp.int32, (k, tp, n_pad), 2)
            oh = (idx_t[:, :, None] == iota_n).astype(jnp.bfloat16)
            # minor-dim-preserving reshape (the allowed kind); row
            # r = j*TP + i keeps the j-major order
            oh = oh.reshape(rows, n_pad)
            oh = jnp.concatenate([oh, tile_bf], axis=1)  # (rows, N_pad+TP)

            def gather_plus_pt(pt):
                """[oh | tile] @ [[z]; [pt]] == z[idx] + pt[row], one
                (pair of) matmul(s)."""
                aug_hi = jnp.concatenate(
                    [z_hi, pt.astype(jnp.bfloat16)], axis=0)
                out = jnp.dot(oh, aug_hi,
                              preferred_element_type=jnp.float32)
                if gather_mode == "onehot":
                    pt_lo = (pt - pt.astype(jnp.bfloat16)
                             .astype(jnp.float32)).astype(jnp.bfloat16)
                    aug_lo = jnp.concatenate([z_lo, pt_lo], axis=0)
                    out = out + jnp.dot(oh, aug_lo,
                                        preferred_element_type=jnp.float32)
                return out

            gs = [jax.nn.relu(gather_plus_pt(pts_ref[0, 0, sl, :]))]
            blk = 0
            for i in range(1, n):
                # first chain matmul carries the point term: the LHS is
                # [g_{i-1} | tile_mat], the RHS [[W_i0]; [pt_i]]
                w0 = w_ref[blk].astype(jnp.float32)           # (G, G)
                blk += 1
                lhs = jnp.concatenate([gs[i - 1], tile_f32], axis=1)
                rhs = jnp.concatenate(
                    [w0, pts_ref[0, i, sl, :].astype(jnp.float32)],
                    axis=0)                             # (G + TP, G)
                y = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
                for j in range(1, i):
                    w = w_ref[blk].astype(jnp.float32)
                    blk += 1
                    y = y + jnp.dot(gs[i - 1 - j], w,
                                    preferred_element_type=jnp.float32)
                gs.append(y if i == n - 1 else jax.nn.relu(y))

            # pooled stage outputs, ordered [g_{n-1}, ..., g_0] to match
            # the decomposed schedule's reversed concat
            for s in range(n):
                out_ref[0, s, sl, :] = kpool(gs[n - 1 - s])

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
    w_p = (wblk.astype(jnp.float32) if wblk.shape[0]
           else jnp.zeros((ncw, g, g), jnp.float32))

    z_spec = pl.BlockSpec((1, n_pad, g), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((1, n_tiles, k, tp), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    pts_spec = pl.BlockSpec((1, n, n_pad, g), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((ncw, g, g), lambda i: (0, 0, 0),
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
                       + 2 * chain_mm * cover * k * g * g),
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
