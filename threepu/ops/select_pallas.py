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
    ``(M, N)`` block resident in VMEM (callers keep ``M * N_pad * 4``
    within a few MB — the conv site is (312, 384) = 479 KB).
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
    d2 = d.reshape(b, m, n).astype(jnp.float32)
    n_pad = -(-n // _LANES) * _LANES
    if n_pad != n:
        d2 = jnp.pad(d2, ((0, 0), (0, 0), (0, n_pad - n)),
                     constant_values=_BIG)

    spec = pl.BlockSpec((1, m, n_pad), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, m, k), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    dist, idx = pl.pallas_call(
        _make_kernel(k, m, n_pad),
        out_shape=(jax.ShapeDtypeStruct((b, m, k), jnp.float32),
                   jax.ShapeDtypeStruct((b, m, k), jnp.int32)),
        grid=(b,),
        in_specs=[spec],
        out_specs=(out_spec, out_spec),
        cost_estimate=pl.CostEstimate(
            flops=6 * k * m * n_pad * b,
            bytes_accessed=(m * n_pad + 2 * m * k) * 4 * b,
            transcendentals=0),
        interpret=interpret,
    )(d2)
    return (dist.reshape(*lead, m, k).astype(d.dtype),
            idx.reshape(*lead, m, k))
