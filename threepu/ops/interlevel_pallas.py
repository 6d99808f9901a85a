"""Fused Pallas kernel for the interlevel feature-propagation skip.

The eval-time interlevel skip (``network/upsampler.py:316-347``) is, per
top patch: for every point of every sub-patch, find the ``K`` spatially
nearest points of the previous level's (shared) point set, gather their
features, and blend them with exp-distance weights in space and feature
space.  The XLA formulation materializes a ``(P, NQ, M)`` distance
matrix (the pipeline's memory ceiling) and row-gathers features at
~10 GB/s effective.

This kernel fuses the whole block with the previous set resident in
VMEM.  Grid = (top patch, sub-patch); per program (one sub-patch):

1. exact top-K spatial selection by K lexicographic min-extraction
   sweeps over a per-tile (q_tile, Mp) distance block computed once
   from coordinate planes — no (NQ, M) matrix is ever stored;
2. each selected column becomes a one-hot row-selection **matmul**
   ``one_hot(idx_k) @ feats`` on the MXU — the TPU-native replacement
   for the slow row gather;
3. weights exactly as the reference: per-sub-patch ``h`` statistics
   (one program IS one sub-patch), spatial x feature exp weights,
   ``w / sum(w + 1e-5)``.

Features travel as bf16 for the selection matmuls (selection logic is
exact; feature values round at ~4e-3 relative inside an interpolation
that is itself blended at 0.2) — validated against the XLA path in
tests.  Duplicate previous points (merged overlapping patches) carry a
ranking penalty plane, reproducing the unique-kNN sentinel semantics
(``ops/knn.py``); coordinates stay true, so when fewer than ``k``
distinct candidates exist the selected duplicates contribute their
real geometry to the weights — exactly like the XLA path, which
recomputes weights from the gathered neighbours.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: exclusion sentinel for the min-extraction sweeps.  Must rank AFTER
#: duplicates (d + _DUP_PENALTY ~ 1e30) and pads (coords 2e15 ->
#: d ~1.2e31): with a smaller sentinel, a query with fewer than k
#: distinct real candidates would re-select an already-extracted
#: column instead of falling back to a duplicate (the XLA path's
#: sentinel ranking selects duplicates there).  1e32 > 3*(2e15)^2 and
#: is exactly representable in f32.
_BIG = 1e32
_BIG_I = 2**30
#: ranking penalty added to duplicate columns.  In f32, d + 1e30 ==
#: 1e30 exactly for real-scale d, so all duplicates tie and selection
#: among them falls to the lowest index — identical to the XLA path's
#: ``where(dup, 1e30, d)`` sentinel (ops/knn.py).  Coordinates stay
#: TRUE (no displacement): the reference recomputes interpolation
#: weights from the selected columns' real coordinates, so a selected
#: duplicate must keep its real geometry.
_DUP_PENALTY = 1e30
#: padding rows sit at huge coordinates so they rank after duplicates.
_PAD_COORD = 2e15

#: trace-time knob (round 5): V2 selection sweeps.  Two bit-identical
#: restructurings of the kernel's hot loop, motivated by the r4e
#: eval_gap re-attribution (the l4 interlevel select is the chunk's
#: largest single term, 37.45 ms = 22%):
#:
#: 1. mutation-based exclusion — extract (min d, min index among ties)
#:    then set THAT column to the sentinel, instead of re-deriving the
#:    5-op lexicographic ``later`` predicate every sweep (~4 elementwise
#:    ops/sweep vs ~8; the exclusion sets are provably identical:
#:    nothing ranks strictly below the extracted column after it is
#:    masked);
#: 2. a 1024-wide selection chunk: the fixed 2048 unit pads the l4 site
#:    M=6240 to 8192 (+31% wasted sweep work); 1024 pads to 7168
#:    (+15%) while the per-chunk merge overhead stays ~9%.
#:
#: OFF until the chip A/B lands (benchmarks/interlevel_v2_bench.py);
#: flips require ``jax.clear_caches()`` (the jit cache does not key on
#: it).
SWEEP_V2 = False


def set_sweep_v2(enabled: bool) -> None:
    global SWEEP_V2
    SWEEP_V2 = bool(enabled)


#: V2 selection-chunk width (see SWEEP_V2 note 2).
SELECT_UNIT_V2 = 1024


def _make_kernel(k: int, n: int, m_pad: int, c_pad: int, q_tile: int):
    n_tiles = n // q_tile
    assert n_tiles * q_tile == n
    v2 = SWEEP_V2

    def kernel(qx_ref, qy_ref, qz_ref, px_ref, py_ref, pz_ref, pen_ref,
               xq_ref, feats_ref, out_ref):
        px = px_ref[0]                       # (1, Mp) TRUE coords
        py = py_ref[0]
        pz = pz_ref[0]
        pen = pen_ref[0]                     # (1, Mp) duplicate penalty
        feats = feats_ref[0]                 # (Mp, Cp) bf16

        j_iota = jax.lax.broadcasted_iota(jnp.int32, (q_tile, m_pad), 1)

        # phase 1: per query tile, exact top-K selection (distances
        # computed once per tile) + one-hot MXU row-selection of the
        # features.  Ranking runs on d + penalty (duplicates last,
        # matching the XLA sentinel path); the weight distance is the
        # TRUE distance of the selected column, extracted by a masked
        # sum over the clean d block — the reference recomputes its
        # weights from the gathered coordinates (upsampler.py:232-250),
        # so a selected duplicate must carry its real distance.
        d_rows, f_rows = [], []              # per tile: (q_tile, K), list
        for t in range(n_tiles):
            sl = pl.ds(t * q_tile, q_tile)
            qx = qx_ref[0, 0, sl]            # (q_tile, 1)
            qy = qy_ref[0, 0, sl]
            qz = qz_ref[0, 0, sl]
            dx = qx - px
            dy = qy - py
            dz = qz - pz
            d = dx * dx + dy * dy + dz * dz  # TRUE distances
            dr = d + pen                     # ranking distances
            d_prev = jnp.full((q_tile, 1), -1.0, jnp.float32)
            i_prev = jnp.full((q_tile, 1), -1, jnp.int32)
            d_sel, feat_sel = [], []
            for s in range(k):
                if v2:
                    # mutation-based exclusion (see SWEEP_V2): dr
                    # already has the extracted columns at _BIG
                    d_k = jnp.min(dr, axis=1, keepdims=True)
                    i_k = jnp.min(jnp.where(dr == d_k, j_iota, _BIG_I),
                                  axis=1, keepdims=True)
                else:
                    later = ((dr > d_prev)
                             | ((dr == d_prev) & (j_iota > i_prev)))
                    cand = jnp.where(later, dr, _BIG)
                    d_k = jnp.min(cand, axis=1, keepdims=True)
                    i_k = jnp.min(jnp.where(cand == d_k, j_iota, _BIG_I),
                                  axis=1, keepdims=True)
                hit = j_iota == i_k
                onehot = hit.astype(jnp.bfloat16)
                feat_k = jnp.dot(onehot, feats,
                                 preferred_element_type=jnp.float32)
                d_true = jnp.sum(jnp.where(hit, d, 0.0), axis=1,
                                 keepdims=True)
                d_sel.append(d_true)
                feat_sel.append(feat_k)
                if v2:
                    if s + 1 < k:
                        dr = jnp.where(hit, _BIG, dr)
                else:
                    d_prev, i_prev = d_k, i_k
            d_rows.append(jnp.concatenate(d_sel, axis=1))
            f_rows.append(feat_sel)          # k x (q_tile, Cp)

        d_s = jnp.concatenate(d_rows, axis=0)           # (N, K)
        xq = xq_ref[0, 0]                                # (N, Cp)
        f_d = jnp.concatenate(
            [jnp.concatenate(
                [jnp.sum((xq[t * q_tile:(t + 1) * q_tile] - fr[kk]) ** 2,
                         axis=1, keepdims=True)
                 for t, fr in enumerate(f_rows)], axis=0)
             for kk in range(k)], axis=1)               # (N, K)

        # phase 2: reference weight formulas (upsampler.py:232-250);
        # h statistics are per sub-patch == per program
        h_s = jnp.mean(d_s[:, :1])
        w_s = jnp.exp(-d_s / (h_s / 2.0))
        h_f = jnp.mean(jnp.min(f_d, axis=1, keepdims=True))
        w_f = jnp.exp(-f_d / (h_f / 2.0))
        w = w_s * w_f
        w = w / jnp.sum(w + 1e-5, axis=1, keepdims=True)

        for t in range(n_tiles):
            interp = jnp.zeros((q_tile, c_pad), jnp.float32)
            for kk in range(k):
                w_blk = w[t * q_tile:(t + 1) * q_tile, kk:kk + 1]
                interp = interp + w_blk * f_rows[t][kk]
            out_ref[0, 0, pl.ds(t * q_tile, q_tile)] = interp

    return kernel


#: column-chunk width for the selection sweeps: bounds the kernel's
#: (q_tile, chunk) transients (the axon compiler's scoped-vmem stack
#: OOMs near (104, 16k) f32 transients — observed 39M > 16M limit)
_SELECT_M_CHUNK = 2048


def _make_select_kernel(k: int, n: int, n_chunks: int, chunk: int,
                        q_tile: int):
    """Selection-only variant: top-K selection emitting (distance,
    index) rows, no feature traffic.  VMEM holds just the coordinate
    planes (3 * Mp * 4 bytes) and fixed (q_tile, chunk) transients — the
    M axis is streamed in :data:`_SELECT_M_CHUNK` column chunks (plane
    refs are laid out (n_chunks, chunk) so the loop indexes the sublane
    axis) — so M scales far beyond what the fused kernel's resident
    (Mp, Cp) feature block allows.

    Each chunk's distances are computed ONCE; k lexicographic-min
    sweeps extract the chunk's sorted top-k, which is merged with the
    running sorted top-k carry via the same sweeps on the 2k-wide
    candidate pool (cost ~k*2k per row — negligible next to the chunk
    sweeps).  Selection order is (distance, index) ascending, identical
    to jax.lax.top_k on the negated matrix."""
    n_tiles = n // q_tile
    assert n_tiles * q_tile == n
    v2 = SWEEP_V2

    def topk_sweeps(d, jj, width_k):
        """Sorted top-``width_k`` of (q_tile, W) candidates by
        lexicographic (d, jj) ascending; returns two (q_tile, width_k)
        lists of column vectors.

        V2 (SWEEP_V2): identical selections via mutation-based
        exclusion — mask the one extracted column (lowest index among
        the minima) to the sentinel instead of re-deriving the
        lexicographic predicate.  Duplicate ``jj`` values only exist
        among the merge carry's _BIG_I initials, which are never
        extracted (every chunk contributes ``k`` real-indexed entries),
        so the index-equality mask always hits exactly one live column.
        """
        d_prev = jnp.full((q_tile, 1), -1.0, jnp.float32)
        i_prev = jnp.full((q_tile, 1), -1, jnp.int32)
        d_sel, i_sel = [], []
        for s in range(width_k):
            if v2:
                d_c = jnp.min(d, axis=1, keepdims=True)
                i_c = jnp.min(jnp.where(d == d_c, jj, _BIG_I),
                              axis=1, keepdims=True)
                if s + 1 < width_k:
                    d = jnp.where(jj == i_c, _BIG, d)
            else:
                later = (d > d_prev) | ((d == d_prev) & (jj > i_prev))
                cand = jnp.where(later, d, _BIG)
                d_c = jnp.min(cand, axis=1, keepdims=True)
                i_c = jnp.min(jnp.where(cand == d_c, jj, _BIG_I),
                              axis=1, keepdims=True)
                d_prev, i_prev = d_c, i_c
            d_sel.append(d_c)
            i_sel.append(i_c)
        return d_sel, i_sel

    def kernel(qx_ref, qy_ref, qz_ref, px_ref, py_ref, pz_ref, pen_ref,
               d_ref, i_ref):
        j_iota = jax.lax.broadcasted_iota(jnp.int32, (q_tile, chunk), 1)

        for t in range(n_tiles):
            sl = pl.ds(t * q_tile, q_tile)
            qx = qx_ref[0, 0, sl]            # (q_tile, 1)
            qy = qy_ref[0, 0, sl]
            qz = qz_ref[0, 0, sl]

            def chunk_body(c, carry):
                best_d, best_i = carry       # (q_tile, k) sorted asc
                px_c = px_ref[0, pl.ds(c, 1), :]      # (1, chunk)
                py_c = py_ref[0, pl.ds(c, 1), :]
                pz_c = pz_ref[0, pl.ds(c, 1), :]
                pen_c = pen_ref[0, pl.ds(c, 1), :]
                dx = qx - px_c
                dy = qy - py_c
                dz = qz - pz_c
                d = dx * dx + dy * dy + dz * dz + pen_c  # computed ONCE
                jj = j_iota + c * chunk
                d_t, i_t = topk_sweeps(d, jj, k)     # chunk top-k
                pool_d = jnp.concatenate([best_d] + d_t, axis=1)
                pool_i = jnp.concatenate([best_i] + i_t, axis=1)
                d_m, i_m = topk_sweeps(pool_d, pool_i, k)
                return (jnp.concatenate(d_m, axis=1),
                        jnp.concatenate(i_m, axis=1))

            d_k, i_k = jax.lax.fori_loop(
                0, n_chunks, chunk_body,
                (jnp.full((q_tile, k), _BIG, jnp.float32),
                 jnp.full((q_tile, k), _BIG_I, jnp.int32)))
            k_pad = d_ref.shape[-1]
            d_ref[0, 0, sl, :] = jnp.pad(d_k, ((0, 0), (0, k_pad - k)))
            i_ref[0, 0, sl, :] = jnp.pad(i_k, ((0, 0), (0, k_pad - k)))

    return kernel


@partial(jax.jit, static_argnames=("k",))
def interlevel_select_pallas(q_xyz: jax.Array, prev_xyz: jax.Array,
                             prev_dup: jax.Array, k: int):
    """Exact spatial top-K of each query against the (shared) previous
    set, unique semantics via the ranking penalty plane (duplicate
    picks return the ``~1e30`` sentinel distance, exactly like the XLA
    path).  Returns ``(dist2 (B, N, k) f32 ascending ranked, idx
    (B, N, k) int32)``."""
    b, n, _ = q_xyz.shape
    p, m, _ = prev_xyz.shape
    assert b % p == 0
    group = b // p
    # pad M to a whole number of selection chunks.  V2: 1024-wide
    # chunks — less padded sweep work at the l4 site (see SWEEP_V2;
    # SELECT_UNIT_V2 is a module knob so the chip A/B can isolate the
    # sweep-body effect from the chunk-width effect)
    base = SELECT_UNIT_V2 if SWEEP_V2 else _SELECT_M_CHUNK
    unit = base if m > base else 512
    m_pad = -(-m // unit) * unit
    k_pad = -(-k // 128) * 128

    chunk = min(base, m_pad)
    n_chunks = m_pad // chunk

    pc = jnp.pad(prev_xyz.astype(jnp.float32),
                 ((0, 0), (0, m_pad - m), (0, 0)),
                 constant_values=_PAD_COORD)
    pen = jnp.pad(
        jnp.where(prev_dup, _DUP_PENALTY, 0.0).astype(jnp.float32),
        ((0, 0), (0, m_pad - m)))
    # chunked plane layout (P, n_chunks, chunk): the kernel streams the
    # M axis by indexing the sublane axis
    p_planes = [pc[..., i].reshape(p, n_chunks, chunk) for i in range(3)]
    p_planes.append(pen.reshape(p, n_chunks, chunk))

    q = q_xyz.astype(jnp.float32).reshape(p, group, n, 3)
    q_planes = [q[..., i][..., None] for i in range(3)]

    q_spec = pl.BlockSpec((1, 1, n, 1), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((1, n_chunks, chunk), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, n, k_pad), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)

    q_tile = _pick_q_tile(n)

    d, idx = pl.pallas_call(
        _make_select_kernel(k, n, n_chunks, chunk, q_tile),
        grid=(p, group),
        in_specs=[q_spec] * 3 + [p_spec] * 4,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((p, group, n, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((p, group, n, k_pad), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * k * p * group * n * m_pad,
            bytes_accessed=p * m_pad * 12 + b * n * k_pad * 8,
            transcendentals=0),
    )(*q_planes, *p_planes)
    return (d[..., :k].reshape(b, n, k),
            idx[..., :k].reshape(b, n, k))


@partial(jax.jit, static_argnames=("k",))
def _interp_from_selection(q_xyz: jax.Array, idx: jax.Array,
                           xq: jax.Array, prev_xyz: jax.Array,
                           prev_feat: jax.Array, k: int) -> jax.Array:
    """XLA tail of the big-M path: gather the K selected feature rows
    and apply the reference weighting (``upsampler.py:316-347``).  The
    gather output is only (B, N, K, C) — the (P, NQ, M) distance matrix
    of the naive XLA formulation never exists.  Spatial distances are
    recomputed from the selected columns' TRUE coordinates (the
    reference derives its weights from the gathered neighbours,
    ``upsampler.py:232-250``), so a duplicate selected when fewer than
    k distinct candidates exist carries its real geometry instead of a
    ranking sentinel."""
    from threepu.ops.gather import batched_gather

    b, n, _ = q_xyz.shape
    p, m, c = prev_feat.shape
    group = b // p
    idx_flat = idx.reshape(p, group * n, k)
    feats = batched_gather(prev_feat, idx_flat).reshape(b, n, k, c)
    nbrs = batched_gather(prev_xyz, idx_flat).reshape(b, n, k, 3)
    d = jax.lax.stop_gradient(
        jnp.sum((q_xyz[..., :, None, :] - nbrs) ** 2, axis=-1))
    h_s = jnp.mean(d[..., :1], axis=-2, keepdims=True)  # per sub-patch
    w_s = jnp.exp(-d / (h_s / 2.0))
    f_d = jax.lax.stop_gradient(
        jnp.sum((xq[..., :, None, :] - feats) ** 2, axis=-1))
    h_f = jnp.mean(jnp.min(f_d, axis=-1, keepdims=True), axis=-2,
                   keepdims=True)
    w_f = jnp.exp(-f_d / (h_f / 2.0))
    w = w_s * w_f
    w = w / jnp.sum(w + 1e-5, axis=-1, keepdims=True)
    return jnp.sum(w[..., None] * feats, axis=-2)


#: the axon remote compiler crashes on kernels with M > ~3.5k AND more
#: than ~40 grid programs; split calls to stay under the limit
_MAX_PROGRAMS_BIG_M = 40
_BIG_M = 3584

#: per-program VMEM budget for the fused kernel: resident feature
#: block (bf16, double-buffered) + xq/out blocks + the kernel's own
#: stack.  Beyond this the axon compiler reports scoped-vmem OOM
#: (observed: 27.2M > 16M limit at M=15872/C=384 round 2; 21.13M > 16M
#: at M=6656/C=384 round 3 after the penalty-plane ranking added a
#: second persistent (q_tile, Mp) distance block), so big-M calls
#: switch to selection-kernel + XLA gather instead.
_FUSED_VMEM_BUDGET = 13 * 2**20


def _pick_q_tile(n: int) -> int:
    for cand in (104, 128, 64, 52, 8):
        if n % cand == 0:
            return cand
    return n


def _fused_vmem_bytes(m_pad: int, c_pad: int, n: int) -> int:
    feats = 2 * m_pad * c_pad * 2          # bf16, double-buffered
    xq_out = 2 * 2 * n * c_pad * 4         # f32 blocks, double-buffered
    planes = 4 * m_pad * 4                 # 3 coords + penalty
    # kernel stack: the sweep loop keeps the true-distance block `d`,
    # the ranking block `dr`, and sweep transients (cand/hit/onehot)
    # live at (q_tile, Mp).  Calibrated against the measured round-3
    # OOM: 21.13M actual vs 12.2M of blocks at (Mp 6656, Cp 384,
    # q_tile 104) -> ~8.9M ~= 3.2 * q_tile * Mp * 4; use 3.5 margin.
    stack = int(3.5 * _pick_q_tile(n) * m_pad * 4)
    return feats + xq_out + planes + stack


def interlevel_interp_pallas(q_xyz: jax.Array, xq: jax.Array,
                             prev_xyz: jax.Array, prev_feat: jax.Array,
                             prev_dup: jax.Array, k: int) -> jax.Array:
    """Dispatching wrapper: fully fused kernel when the previous-level
    feature block fits VMEM, otherwise selection kernel + XLA gather
    (see the module docstring and :func:`interlevel_select_pallas`)."""
    b, n, _ = q_xyz.shape
    p, m, c = prev_feat.shape
    group = b // p
    m_pad = -(-m // 512) * 512
    c_pad = -(-c // 128) * 128
    if _fused_vmem_bytes(m_pad, c_pad, n) > _FUSED_VMEM_BUDGET:
        _, idx = interlevel_select_pallas(q_xyz, prev_xyz, prev_dup, k)
        return _interp_from_selection(q_xyz, idx, xq, prev_xyz,
                                      prev_feat, k)
    if p * group <= _MAX_PROGRAMS_BIG_M:
        return _interlevel_call(q_xyz, xq, prev_xyz, prev_feat,
                                prev_dup, k)
    # Split BOTH grid axes into segments whose product stays <= MAX
    # programs: group (sub-patch) first — with whole-shape patches
    # (e.g. n_sub=160 at num_point=5000) it alone exceeds the limit —
    # then the top-patch axis.  Unconditional (not just big-M): the
    # axon remote compile helper also crashes on >40-program grids at
    # small M when the surrounding program is large (observed with
    # cascade chunk=16), and segmenting costs nothing measurable.
    # g_seg is capped at 10 so the production cascade levels (group =
    # 10/20/40 at chunk 8) all segment to the SAME (4, 10) grid — with
    # the caller's prev-set padding this makes every level share ONE
    # kernel instance (one axon kernel compile instead of three).
    g_seg = min(group, 10, _MAX_PROGRAMS_BIG_M)
    p_seg = max(1, _MAX_PROGRAMS_BIG_M // g_seg)
    q4 = q_xyz.reshape(p, group, n, 3)
    xq4 = xq.reshape(p, group, n, c)
    outs_p = []
    for ps in range(0, p, p_seg):
        pe = min(ps + p_seg, p)
        outs_g = []
        for gs in range(0, group, g_seg):
            ge = min(gs + g_seg, group)
            sub = _interlevel_call(
                q4[ps:pe, gs:ge].reshape((pe - ps) * (ge - gs), n, 3),
                xq4[ps:pe, gs:ge].reshape((pe - ps) * (ge - gs), n, c),
                prev_xyz[ps:pe], prev_feat[ps:pe], prev_dup[ps:pe], k)
            outs_g.append(sub.reshape(pe - ps, ge - gs, n, c))
        outs_p.append(jnp.concatenate(outs_g, axis=1))
    return jnp.concatenate(outs_p, axis=0).reshape(b, n, c)


@partial(jax.jit, static_argnames=("k",))
def _interlevel_call(q_xyz: jax.Array, xq: jax.Array,
                     prev_xyz: jax.Array, prev_feat: jax.Array,
                     prev_dup: jax.Array, k: int) -> jax.Array:
    """Fused interlevel interpolation.

    Args:
      q_xyz: ``(B, N, 3)`` sub-patch points (unnormalized frame).
      xq: ``(B, N, C)`` sub-patch features.
      prev_xyz: ``(P, M, 3)`` previous-level points, ``P`` divides ``B``.
      prev_feat: ``(P, M, C)``.
      prev_dup: ``(P, M)`` duplicate mask (True = never select).
      k: neighbours (fm_knn, static).

    Returns:
      ``(B, N, C)`` interpolated features (caller applies the
      ``0.2 * interp + x`` blend).
    """
    b, n, _ = q_xyz.shape
    p, m, c = prev_feat.shape
    assert b % p == 0
    group = b // p

    c_pad = -(-c // 128) * 128
    m_pad = -(-m // 512) * 512

    pc = jnp.pad(prev_xyz.astype(jnp.float32),
                 ((0, 0), (0, m_pad - m), (0, 0)),
                 constant_values=_PAD_COORD)
    p_planes = [pc[..., i][:, None, :] for i in range(3)]   # (P, 1, Mp)
    pen = jnp.pad(
        jnp.where(prev_dup, _DUP_PENALTY, 0.0).astype(jnp.float32),
        ((0, 0), (0, m_pad - m)))[:, None, :]               # (P, 1, Mp)
    p_planes.append(pen)

    q = q_xyz.astype(jnp.float32).reshape(p, group, n, 3)
    q_planes = [q[..., i][..., None] for i in range(3)]     # (P, G, N, 1)

    feats = jnp.pad(prev_feat, ((0, 0), (0, m_pad - m),
                                (0, c_pad - c))).astype(jnp.bfloat16)
    xq_r = jnp.pad(xq.astype(jnp.float32).reshape(p, group, n, c),
                   ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))

    q_spec = pl.BlockSpec((1, 1, n, 1), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((1, 1, m_pad), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    xq_spec = pl.BlockSpec((1, 1, n, c_pad), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
    feat_spec = pl.BlockSpec((1, m_pad, c_pad), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, n, c_pad), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)

    q_tile = _pick_q_tile(n)

    out = pl.pallas_call(
        _make_kernel(k, n, m_pad, c_pad, q_tile),
        grid=(p, group),
        in_specs=[q_spec] * 3 + [p_spec] * 4 + [xq_spec, feat_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((p, group, n, c_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * p * group * n * m_pad * c_pad,
            bytes_accessed=p * m_pad * c_pad * 2 + b * n * c_pad * 8,
            transcendentals=2 * b * n * k),
    )(*q_planes, *p_planes, xq_r, feats)
    return out[..., :c].reshape(b, n, c)
