"""Exact k-smallest selection as a Pallas kernel.

Round-4 finding (``benchmarks/eval_gap.py``, RESULTS.md): the eval
cascade is SELECTION-bound — ``lax.top_k`` k=33 over the (320,312,312)
conv-site distance matrix costs 14.9 ms, ~100x off the HBM roofline
(XLA lowers every top_k to its full variadic-sort expansion), and the
exact composed reformulations all lose (split-top-k 3x slower, full
sort +13%).  ``approx_min_k`` reaches 9.4 ms only by changing
selection semantics.

This kernel selects EXACTLY, with ``lax.top_k``'s ordering
(ascending value, ties broken to the lowest index), by k
lexicographic-min extraction sweeps over a VMEM-resident distance
block — the same selection machinery the interlevel kernel uses
(``ops/interlevel_pallas.py``), without any feature traffic.  Each
sweep is a handful of VPU elementwise ops + two cross-lane reduces on
the (M, N) block: ~k * M * N * 6 flops total, arithmetically ~100x
less work than a full sort of every row.

Semantics notes (mirroring ``ops/knn.py``):

- the caller passes the PENALIZED distance matrix (duplicates/invalid
  at 1e30), exactly what it would hand to ``lax.top_k``; selected
  values are returned verbatim, so the (dist2, idx) contract is
  bit-identical to the XLA path;
- column padding uses 1e32 (``_BIG``): strictly after every real
  distance AND every 1e30 penalty — a row with fewer than k
  unpenalized columns falls back to penalized columns in index order,
  exactly like top_k — and exactly representable in f32;
- ties break to the lowest index because the sweep takes
  ``min(index)`` among columns equal to the sweep's ``min(value)``,
  and later sweeps exclude columns lexicographically <= the previous
  pick (value first, index second).

Reference site: the per-conv feature kNN this accelerates descends
from ``network/operations.py:207`` (torch.topk) via
``ops/knn.py::knn_group``.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
#: column-padding sentinel: after every real distance and after the
#: 1e30 dedup/invalid penalties; exactly representable in f32.
_BIG = 1e32
_BIG_I = 2 ** 30

#: f32 elements per program block.  Measured on chip (round 4,
#: ``benchmarks/logs/chip_queue_r4e.log``): Mosaic's scoped-VMEM
#: footprint for this kernel is ~53 bytes/element (a 399k-element
#: (624, 640) block allocated 21.17M against the 16M limit, ~13x the
#: f32 block itself — the sweep temporaries are live together, though
#: reused across the k unrolled sweeps).  2^17 elements => ~6.9 MB,
#: a 2.3x margin; the conv site (312, 384) = 119,808 elements stays a
#: single whole-block program, byte-identical to the round-4 measured
#: one.  Rows are independent, so anything larger streams over a
#: second grid axis of row chunks (see :func:`_row_tile`).
_MAX_TILE_ELEMS = 1 << 17


def _row_tile(m: int, n_pad: int) -> int:
    """Rows per program: the whole block when it fits the measured
    VMEM budget, else the largest 8-aligned (sublane) row chunk that
    does; 0 when even an 8-row chunk would not fit (n alone overflows
    the budget — the caller falls back to ``lax.top_k``, which is
    bit-identical by this kernel's contract)."""
    if m * n_pad <= _MAX_TILE_ELEMS:
        return m
    return (_MAX_TILE_ELEMS // n_pad) // 8 * 8


def _make_kernel(k: int, m: int, n_pad: int):
    def kernel(d_ref, dout_ref, iout_ref):
        d = d_ref[0]                          # (m, n_pad) f32
        jj = jax.lax.broadcasted_iota(jnp.int32, (m, n_pad), 1)
        d_prev = jnp.full((m, 1), -jnp.inf, jnp.float32)
        i_prev = jnp.full((m, 1), -1, jnp.int32)
        d_sel, i_sel = [], []
        for _ in range(k):
            later = (d > d_prev) | ((d == d_prev) & (jj > i_prev))
            cand = jnp.where(later, d, _BIG)
            d_c = jnp.min(cand, axis=1, keepdims=True)
            i_c = jnp.min(jnp.where(cand == d_c, jj, _BIG_I),
                          axis=1, keepdims=True)
            d_sel.append(d_c)
            i_sel.append(i_c)
            d_prev, i_prev = d_c, i_c
        dout_ref[0] = jnp.concatenate(d_sel, axis=1)
        iout_ref[0] = jnp.concatenate(i_sel, axis=1)

    return kernel


@partial(jax.jit, static_argnames=("k", "interpret"))
def select_pallas(d: jax.Array, k: int, *,
                  interpret: bool = False):
    """Exact k-smallest per row of ``d (..., M, N)`` -> ``(dist2, idx)``
    of shape ``(..., M, k)``, ordered (value, index) ascending —
    bit-identical to ``(-top_k(-d, k)[0], top_k(-d, k)[1])``.

    Differentiable like ``top_k``: the selected values are a gather
    from ``d``, so the VJP scatters the value-cotangent back to the
    selected columns (indices are unique per row, so the scatter is
    disjoint and deterministic).  The train step differentiates
    through selection (the fm-distance path), which is why the kernel
    carries a custom VJP instead of relying on Pallas AD.

    The leading dims flatten into the grid; one program owns one
    ``(m_tile, N_pad)`` block resident in VMEM.  Rows are independent,
    so blocks larger than the measured VMEM budget
    (:data:`_MAX_TILE_ELEMS`, ~53 bytes/element Mosaic footprint)
    stream over a second grid axis of 8-aligned row chunks; the conv
    site (312, 384) = 119,808 elements stays one whole-block program.
    When ``N_pad`` alone overflows the budget the call degrades to
    ``lax.top_k`` (bit-identical), so the op compiles at every shape
    like the reference's ``torch.topk``.
    """
    return _make_select(d.shape, jnp.dtype(d.dtype).name, k, interpret)(d)


@lru_cache(maxsize=None)
def _make_select(shape, dtype_name: str, k: int, interpret: bool):
    *lead, m, n = shape
    b = 1
    for s in (*lead, m):
        b *= s

    @jax.custom_vjp
    def f(d):
        return _select_impl(d, k, interpret)

    def fwd(d):
        dist, idx = _select_impl(d, k, interpret)
        return (dist, idx), idx

    def bwd(idx, cots):
        g = cots[0]  # idx cotangent is float0/symbolic-zero
        rows = jnp.arange(b, dtype=jnp.int32)[:, None]
        dd = jnp.zeros((b, n), g.dtype).at[
            rows, idx.reshape(b, k)].add(g.reshape(b, k))
        return (dd.reshape(shape).astype(dtype_name),)

    f.defvjp(fwd, bwd)
    return f


def _select_impl(d: jax.Array, k: int, interpret: bool):
    *lead, m, n = d.shape
    if k > n:
        raise ValueError(f"k={k} exceeds candidate count {n}")
    b = 1
    for s in lead:
        b *= s
    n_pad = -(-n // _LANES) * _LANES
    m_tile = _row_tile(m, n_pad)
    if m_tile == 0:
        # n alone overflows the per-program VMEM budget: lax.top_k is
        # bit-identical by contract, so degrade transparently instead
        # of failing at compile time (the reference's torch.topk works
        # at every shape, network/operations.py:207).
        neg_top, idx = jax.lax.top_k(-d, k)
        return -neg_top, idx.astype(jnp.int32)
    d2 = d.reshape(b, m, n).astype(jnp.float32)
    if n_pad != n:
        d2 = jnp.pad(d2, ((0, 0), (0, 0), (0, n_pad - n)),
                     constant_values=_BIG)
    m_pad = -(-m // m_tile) * m_tile
    if m_pad != m:
        # zero rows: each selects k zeros, sliced off below
        d2 = jnp.pad(d2, ((0, 0), (0, m_pad - m), (0, 0)))

    if m_tile == m:
        # whole-block program, byte-identical to the round-4 measured
        # one (single grid axis)
        grid = (b,)
        in_map = lambda i: (i, 0, 0)
        out_map = lambda i: (i, 0, 0)
    else:
        grid = (b, m_pad // m_tile)
        in_map = lambda i, j: (i, j, 0)
        out_map = lambda i, j: (i, j, 0)
    spec = pl.BlockSpec((1, m_tile, n_pad), in_map,
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, m_tile, k), out_map,
                            memory_space=pltpu.VMEM)
    dist, idx = pl.pallas_call(
        _make_kernel(k, m_tile, n_pad),
        out_shape=(jax.ShapeDtypeStruct((b, m_pad, k), jnp.float32),
                   jax.ShapeDtypeStruct((b, m_pad, k), jnp.int32)),
        grid=grid,
        in_specs=[spec],
        out_specs=(out_spec, out_spec),
        cost_estimate=pl.CostEstimate(
            flops=6 * k * m_pad * n_pad * b,
            bytes_accessed=(m_pad * n_pad + 2 * m_pad * k) * 4 * b,
            transcendentals=0),
        interpret=interpret,
    )(d2)
    if m_pad != m:
        dist, idx = dist[:, :m], idx[:, :m]
    return (dist.reshape(*lead, m, k).astype(d.dtype),
            idx.reshape(*lead, m, k))
