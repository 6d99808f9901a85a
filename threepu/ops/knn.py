"""k-nearest-neighbour grouping.

Equivalent capability of the reference's ``group_knn``
(reference: ``network/operations.py:165-216``) and of the dead faiss KNN
path (``network/operations.py:33-106``): a dense squared-distance matrix
(MXU matmul) followed by top-k.  Differences from the reference, by
design:

- the ``unique=True`` duplicate handling runs fully on device
  (:func:`threepu.ops.distances.duplicate_mask`) instead of a host
  ``np.unique`` round trip per batch element,
- an optional ``valid_mask`` supports static-shape pipelines: masked
  points get ``+inf``-like distance so they are never selected (the TPU
  replacement for the reference's dynamic-shape outlier filtering at
  ``network/upsampler.py:63-75``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from threepu.ops.distances import pairwise_dist2, duplicate_mask
from threepu.ops.gather import batched_gather


class KnnResult(NamedTuple):
    neighbors: jax.Array  # (..., M, k, C) grouped neighbour coordinates
    idx: jax.Array        # (..., M, k) int32 indices into the point set
    dist2: jax.Array      # (..., M, k) squared distances, ascending


#: default selection backend: "exact" | "approx" | "auto".
#: "auto" uses the TPU-optimized partial-reduce top-k
#: (lax.approx_max_k) only on TPU for large candidate sets (N >=
#: 4096) with small k (<= 64); everywhere else it stays exact.
#:
#: Default EXACT (round 3): the measured ablation at the headline
#: config (benchmarks/e2e_quality.py --knn_ablation) shows "auto" and
#: "exact" produce BIT-IDENTICAL output there — the pipeline's only
#: N >= 4096 selections have k > 64 (seed grouping) or run in the
#: interlevel Pallas kernel, so approx never engaged — and exact
#: measured marginally FASTER end to end (1.516 vs 1.537 s/shape).
#: Exact also matches the reference's always-exact selection
#: (``network/operations.py:207`` torch.topk) on the remaining big-N
#: small-k site (the k=2 outlier check on >= 4096-point shapes).
#: "auto"/"approx" stay available for throughput-over-fidelity runs
#: via :func:`set_knn_method` or the CLI ``--knn_method`` flag.
DEFAULT_METHOD = "exact"
APPROX_RECALL_TARGET = 0.95
_APPROX_MIN_N = 4096
_APPROX_MAX_K = 64

_KNN_METHODS = ("auto", "exact", "approx", "sort")

#: trace-time flag: when True, "exact" selection lowers to a stable
#: full sort + slice instead of ``lax.top_k``.  GSPMD cannot partition
#: TopK over a sharded batch axis — every top_k in a sharded-jit
#: program forces an all-gather of its operand (measured: 12
#: activation-sized all-gathers in the sharded train step, one per kNN
#: site) — while ``lax.sort`` partitions cleanly over non-sort
#: dimensions with zero collectives.  The stable ascending sort selects
#: the same k indices in the same order as top_k (ties break to the
#: lowest index in both).  Superseded in the sharded train step by
#: :class:`shard_select` (which keeps the fast per-device kernels);
#: kept as the fallback for selection sites whose leading axis does
#: not divide over the mesh, and as an explicit method knob.
_PARTITION_SAFE = False

#: trace-time mesh context (set by
#: :func:`threepu.parallel.make_sharded_train_step` via
#: :class:`shard_select`): exact selection runs LOCALLY per device
#: under ``jax.shard_map`` over the batch axis.  Per-row selection
#: commutes with batch partitioning, so the result is bit-identical to
#: the global op; GSPMD never sees a TopK (or an opaque Pallas
#: custom-call) to mangle — zero collectives, like the sort backend —
#: and on TPU the exact-selection Pallas kernel engages per shard
#: exactly as in the serial step (the sort backend pays a full
#: variadic sort per site, ~2x the kernel at the conv sites).
_SHARD_SELECT = None


class shard_select:
    """Context manager: trace exact kNN selections as per-device local
    ops under ``jax.shard_map`` over ``axis_name`` of ``mesh`` (see
    ``_SHARD_SELECT``)."""

    def __init__(self, mesh, axis_name: str = "data"):
        self.ctx = (mesh, axis_name) if mesh is not None else None

    def __enter__(self):
        global _SHARD_SELECT
        self.saved = _SHARD_SELECT
        _SHARD_SELECT = self.ctx
        return self

    def __exit__(self, *exc):
        global _SHARD_SELECT
        _SHARD_SELECT = self.saved
        return False


class partition_safe:
    """Context manager: trace kNN selections with the partition-safe
    sort backend (see ``_PARTITION_SAFE``)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled

    def __enter__(self):
        global _PARTITION_SAFE
        self.saved = _PARTITION_SAFE
        _PARTITION_SAFE = self.enabled
        return self

    def __exit__(self, *exc):
        global _PARTITION_SAFE
        _PARTITION_SAFE = self.saved
        return False


def _sort_select(d: jax.Array, k: int):
    """Stable ascending sort + slice: top_k-equivalent selection that
    GSPMD can partition over batch axes (no collectives)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    sd, si = jax.lax.sort((d, iota), num_keys=1, dimension=-1,
                          is_stable=True)
    return sd[..., :k], si[..., :k]


#: number of contiguous splits for the two-stage EXACT selection
#: (:func:`_split_select`); 0 disables it (direct ``lax.top_k``).
#: Motivation (round 4, ``benchmarks/eval_gap.py``): the eval cascade
#: is selection-bound — ``lax.top_k`` k=33 over (320,312,312) costs
#: 14.9 ms/conv while ``approx_min_k`` runs the same site at 9.9 ms by
#: reducing per-partition first.  The split select applies the same
#: partial-reduce structure WITHOUT the semantics change: per-split
#:  top_k -> merge -> top_k is exact and bit-identical to direct
#: ``lax.top_k`` including tie-breaking.  Default set by on-chip
#: measurement (``benchmarks/select_bench.py``).
EXACT_SPLITS = 0


def set_exact_splits(s: int) -> None:
    """Set the split count for exact selection (0 = direct top_k).
    Trace-time, like :func:`set_knn_method`."""
    global EXACT_SPLITS
    EXACT_SPLITS = int(s)


def _split_select(d: jax.Array, k: int, s: int):
    """Two-stage EXACT k-smallest selection: split the candidate axis
    into ``s`` contiguous blocks, ``top_k`` each, merge the ``s*k``
    survivors, ``top_k`` again.

    Exactness: every one of the k overall smallest is among its own
    block's k smallest, so the merge set contains the answer.

    Bit-identical tie-breaking vs direct ``lax.top_k`` (which returns
    equal values lowest-index-first): blocks are contiguous, so the
    merge vector — ordered block-major, value-sorted (lowest-index-
    first) within each block — lists every group of equal values in
    ascending global-index order, and the final ``top_k``'s
    lowest-POSITION preference therefore picks lowest global index.
    Verified against top_k on mass-tie inputs (the dedup penalty
    columns are exactly such a tie group) in
    ``tests/test_ops.py::TestSplitSelect``.

    Requires ``n % s == 0`` and ``k <= n // s`` (callers fall back to
    direct top_k otherwise).
    """
    *lead, n = d.shape
    m = n // s
    dr = d.reshape(*lead, s, m)
    neg_v, li = jax.lax.top_k(-dr, k)                   # (*lead, s, k)
    gi = li + (jnp.arange(s, dtype=jnp.int32) * m)[:, None]
    cand_v = neg_v.reshape(*lead, s * k)
    cand_i = gi.reshape(*lead, s * k)
    neg_top, pos = jax.lax.top_k(cand_v, k)
    idx = jnp.take_along_axis(cand_i, pos, axis=-1)
    return -neg_top, idx


#: dispatch exact selection to the Pallas min-extraction kernel
#: (:func:`threepu.ops.select_pallas.select_pallas`, bit-identical to
#: ``lax.top_k`` including tie-breaking) on TPU when the per-program
#: block fits VMEM comfortably.  Default ON by on-chip measurement
#: (``benchmarks/select_pallas_bench.py``, round 4): ``lax.top_k``
#: lowers to a full variadic sort, ~100x off the roofline at the conv
#: site — the kernel halves the selection-bound cascade's conv cost
#: (18.2 -> 10.9 ms in-level, chunk 218.7 -> 170.0 ms) and lifts the
#: 16x headline 59.0k -> 75.3k pts/s with BIT-IDENTICAL end-to-end
#: output (e2e TTFS 70 -> 120 s: ~4 extra kernel instances).
#: ``set_exact_select_pallas(False)`` restores plain ``lax.top_k``.
EXACT_SELECT_PALLAS = True
#: block cap for the kernel path: M * N_pad f32 elements per call
#: site.  This no longer bounds VMEM — the kernel row-tiles itself to
#: ~2^17-element programs (see ``select_pallas._MAX_TILE_ELEMS``; the
#: round-4 gate at this value ADMITTED a (624, 640) k=33 block that
#: OOM'd scoped VMEM on chip at Mosaic's measured ~53 B/element
#: footprint, chip_queue_r4e.log) — it only bounds WHICH sites engage,
#: keeping the engaging-site set exactly the one the round-4 chip
#: measurements covered.  Sites above it keep ``lax.top_k``.
_PALLAS_SELECT_MAX_BLOCK = 1 << 20
#: k cap for the kernel path: the kernel's cost (and its unrolled
#: Mosaic body) scales linearly with k — the measured wins are the
#: small-k graph-build sites (conv k=33, fm_knn=5).  Large-k
#: selections (seed grouping / patch extraction at k=num_point=312)
#: keep ``lax.top_k``.  MEASURED (select_cap_bench, chip_queue_r4e):
#: raising the cap to 512 — i.e. unrolling the kernel at the k=312
#: sites — is bit-identical but does NOT pay: 73.1k vs 74.3k pts/s at
#: the headline (the seed/extraction stages are once-per-shape and the
#: 312-sweep unroll is no faster than the sort there), so 64 stands.
_PALLAS_SELECT_MAX_K = 64


def set_exact_select_pallas(enabled: bool) -> None:
    """Route exact selection through the Pallas kernel (trace-time,
    like :func:`set_knn_method`; TPU only, same results bit-for-bit)."""
    global EXACT_SELECT_PALLAS
    EXACT_SELECT_PALLAS = bool(enabled)


#: test knob: treat any backend as kernel-capable and run the selection
#: kernel in Pallas interpret mode, so the CPU suite can execute the
#: EXACT shipped TPU dispatch path — gate conditions included — without
#: a chip (tests/test_golden.py pins the default dispatch this way).
_INTERPRET_SELECT = False


def set_select_interpret(enabled: bool) -> None:
    """Trace-time test knob (see ``_INTERPRET_SELECT``); callers must
    ``jax.clear_caches()`` around flips — the jit cache does not key on
    it."""
    global _INTERPRET_SELECT
    _INTERPRET_SELECT = bool(enabled)


def _exact_select(d: jax.Array, k: int):
    """Exact selection: per-device-local under a :class:`shard_select`
    mesh context, else :func:`_exact_select_local` directly."""
    if _SHARD_SELECT is not None:
        mesh, axis = _SHARD_SELECT
        n_dev = mesh.shape[axis]
        # ASSUMPTION: "ndim >= 3 and leading axis divisible by the
        # mesh" is a proxy for "the leading axis IS the sharded batch
        # axis".  A divisible-but-differently-sharded operand would be
        # force-resharded by in_specs (extra collectives; results stay
        # bit-identical — per-row selection commutes with any
        # partition).  Every new sharded program must therefore pass
        # tests/test_collectives.py's zero-collective HLO audit before
        # its scaling is trusted (CLAUDE.md).
        if d.ndim >= 3 and d.shape[0] % n_dev == 0:
            from jax.sharding import PartitionSpec as P

            spec = P(axis, *([None] * (d.ndim - 1)))
            # check_vma=False: the body can contain the Pallas selection
            # kernel, whose pallas_call out_shape carries no varying-
            # manual-axes annotation — with the checker on, the TPU
            # trace fails ("vma on ShapeDtypeStruct must not be None";
            # chip_queue_r5a.log).  The body is per-device pure with
            # matching in/out specs, so the check adds nothing here.
            # CPU regression: tests/test_collectives.py::
            # test_kernel_inside_shard_map_traces (interpret knob).
            return jax.shard_map(
                lambda x: _exact_select_local(x, k), mesh=mesh,
                in_specs=(spec,), out_specs=(spec, spec),
                check_vma=False)(d)
        # unsizeable site (none in the shipped sharded programs):
        # partition-safe sort rather than a GSPMD TopK all-gather
        return _sort_select(d, k)
    return _exact_select_local(d, k)


def _exact_select_local(d: jax.Array, k: int):
    """Exact selection: direct ``lax.top_k``, or a bit-identical
    variant when enabled and applicable."""
    n = d.shape[-1]
    if (EXACT_SELECT_PALLAS and d.ndim >= 2
            and k <= _PALLAS_SELECT_MAX_K
            and (jax.default_backend() == "tpu" or _INTERPRET_SELECT)
            # m >= 8: a near-empty row block would add a whole kernel
            # instance (~60-100s axon remote compile, CLAUDE.md) to a
            # site where top_k is already cheap (e.g. the m=1 outlier
            # check)
            and d.shape[-2] >= 8
            and d.shape[-2] * (-(-n // 128) * 128)
            <= _PALLAS_SELECT_MAX_BLOCK):
        from threepu.ops import select_pallas as _sp
        return _sp.select_pallas(d, k, interpret=_INTERPRET_SELECT)
    s = EXACT_SPLITS
    if s > 1 and n % s == 0 and k <= n // s:
        return _split_select(d, k, s)
    neg_top, idx = jax.lax.top_k(-d, k)
    return -neg_top, idx


def set_knn_method(method: str) -> None:
    """Set the global default kNN selection backend (trace-time)."""
    global DEFAULT_METHOD
    if method not in _KNN_METHODS:
        raise ValueError(
            f"unknown knn method {method!r}; choose from {_KNN_METHODS}")
    DEFAULT_METHOD = method


def get_knn_method() -> str:
    return DEFAULT_METHOD


def knn_group(
    query: jax.Array,
    points: jax.Array,
    k: int,
    *,
    unique: bool = False,
    valid_mask: Optional[jax.Array] = None,
    dup_mask: Optional[jax.Array] = None,
    method: Optional[str] = None,
    recall_target: Optional[float] = None,
    with_neighbors: bool = True,
    precision=None,
) -> KnnResult:
    """Group the ``k`` nearest ``points`` around each ``query``.

    Args:
      query: ``(..., M, C)``.
      points: ``(..., N, C)``.
      k: neighbourhood size (static).
      unique: push exact duplicate rows of ``points`` (all but the first
        occurrence) behind every distinct point in the ranking, matching
        the reference's ``np.unique`` masking semantics.
      valid_mask: optional boolean ``(..., N)``; invalid points rank last.
      dup_mask: optional precomputed duplicate mask ``(..., N)``.  When
        the point set is a deterministic per-point function of a cheaper
        space (e.g. features derived from xyz), duplicates can only come
        from duplicates there — pass that mask instead of paying the
        ``N^2 * C`` feature-space comparison.

    Returns:
      :class:`KnnResult` with neighbours sorted by ascending distance.
    """
    n = points.shape[-2]
    if k > n:
        raise ValueError(f"k={k} exceeds point count {n}")
    d = pairwise_dist2(query, points, precision=precision)  # (..., M, N)
    penalty = None
    if unique:
        dup = duplicate_mask(points) if dup_mask is None else dup_mask
        penalty = dup
    if valid_mask is not None:
        invalid = ~valid_mask
        penalty = invalid if penalty is None else (penalty | invalid)
    if penalty is not None:
        # The reference adds max(D) to duplicate columns
        # (operations.py:204), which preserves relative order *among*
        # duplicates; a single-pass finite sentinel gives the same
        # selection whenever k does not exceed the number of unpenalized
        # points (always true in practice) without the extra full-matrix
        # max reduce + rewrite.
        d = jnp.where(penalty[..., None, :], jnp.asarray(1e30, d.dtype), d)

    method = method or DEFAULT_METHOD
    if method == "auto":
        method = ("approx" if (n >= _APPROX_MIN_N and k <= _APPROX_MAX_K
                               and jax.default_backend() == "tpu")
                  else "exact")
    if method == "approx":
        neg_top, idx = jax.lax.approx_max_k(
            -d, k, recall_target=recall_target or APPROX_RECALL_TARGET)
        dist2 = -neg_top
    elif method == "sort" or (method == "exact" and _PARTITION_SAFE):
        dist2, idx = _sort_select(d, k)
    elif method == "exact":
        dist2, idx = _exact_select(d, k)
    else:
        raise ValueError(f"unknown knn method {method!r}")
    idx = idx.astype(jnp.int32)
    # callers that only need indices (fused edge conv) skip the gather
    nbrs = batched_gather(points, idx) if with_neighbors else None
    return KnnResult(neighbors=nbrs, idx=idx, dist2=dist2)


def group_knn(k: int, query: jax.Array, points: jax.Array,
              unique: bool = True, NCHW: bool = True):
    """Reference-compatible wrapper (``network/operations.py:165``).

    Args/returns follow the reference convention: with ``NCHW=True``
    inputs are ``(B, C, M)`` / ``(B, C, N)`` and neighbours come back as
    ``(B, C, M, k)``; otherwise channels-last.  ``idx``/``dist2`` are
    always ``(B, M, k)``.
    """
    if NCHW:
        query = jnp.swapaxes(query, -1, -2)
        points = jnp.swapaxes(points, -1, -2)
    res = knn_group(query, points, k, unique=unique)
    nbrs = res.neighbors
    if NCHW:
        nbrs = jnp.moveaxis(nbrs, -1, -3)  # (B, C, M, k)
    return nbrs, res.idx, res.dist2
