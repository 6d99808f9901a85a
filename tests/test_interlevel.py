import unittest.mock as mock

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental import pallas as pl

import threepu.ops.interlevel_pallas as il
from threepu.ops import knn_group
from threepu.ops.gather import batched_gather
from threepu.models.upsampler import exponential_distance


def _xla_reference(q, xq, pxyz, pf, dup, k):
    """The Level grouped-branch math with exact top-k."""
    p = pxyz.shape[0]
    b, n, _ = q.shape
    group = b // p
    qr = q.reshape(p, group * n, 3)
    res = knn_group(qr, pxyz, k, unique=True, dup_mask=dup,
                    method="exact")
    nbrs = res.neighbors.reshape(b, n, k, 3)
    feats = batched_gather(pf, res.idx).reshape(b, n, k, -1)
    _, sw = exponential_distance(q, nbrs)
    _, fw = exponential_distance(xq, feats)
    w = sw * fw
    w = w / jnp.sum(w + 1e-5, -1, keepdims=True)
    return jnp.sum(w[..., None] * feats, -2)


class TestInterlevelKernel:
    @pytest.fixture(params=[False, True], ids=["v1", "v2"], autouse=True)
    def sweep_v2(self, request):
        """Every kernel test runs under both sweep generations (the V2
        mutation-based sweeps must be drop-in bit-identical)."""
        il.set_sweep_v2(request.param)
        jax.clear_caches()
        yield request.param
        il.set_sweep_v2(False)
        jax.clear_caches()

    def test_interpret_matches_xla(self, rng):
        P, G, N, M, C, K = 2, 3, 16, 40, 12, 4
        q = jnp.asarray(rng.standard_normal((P * G, N, 3)).astype(np.float32))
        xq = jnp.asarray(
            rng.standard_normal((P * G, N, C)).astype(np.float32))
        pxyz = rng.standard_normal((P, M, 3)).astype(np.float32)
        pxyz[0, 7] = pxyz[0, 3]                 # duplicate pair
        pf = rng.standard_normal((P, M, C)).astype(np.float32)
        pf[0, 7] = pf[0, 3]                     # duplicate features match
        dup = np.zeros((P, M), bool)
        dup[0, 7] = True

        ref = _xla_reference(q, xq, jnp.asarray(pxyz), jnp.asarray(pf),
                             jnp.asarray(dup), K)
        orig = pl.pallas_call
        with mock.patch.object(
                il.pl, "pallas_call",
                lambda *a, **kw: orig(*a, interpret=True, **kw)):
            got = il.interlevel_interp_pallas(
                q, xq, jnp.asarray(pxyz), jnp.asarray(pf),
                jnp.asarray(dup), K)
        # bf16 feature rounding inside the kernel: ~4e-3 relative
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)

    def test_select_path_matches_xla(self, rng):
        """Big-M dispatch (selection kernel + XLA gather) must agree
        with the exact XLA formulation; features stay f32 here so the
        tolerance is float noise, not the bf16 band."""
        P, G, N, M, C, K = 2, 3, 16, 40, 12, 4
        q = jnp.asarray(rng.standard_normal((P * G, N, 3)).astype(np.float32))
        xq = jnp.asarray(
            rng.standard_normal((P * G, N, C)).astype(np.float32))
        pxyz = rng.standard_normal((P, M, 3)).astype(np.float32)
        pxyz[0, 7] = pxyz[0, 3]
        pf = rng.standard_normal((P, M, C)).astype(np.float32)
        pf[0, 7] = pf[0, 3]
        dup = np.zeros((P, M), bool)
        dup[0, 7] = True

        ref = _xla_reference(q, xq, jnp.asarray(pxyz), jnp.asarray(pf),
                             jnp.asarray(dup), K)
        orig = pl.pallas_call
        with mock.patch.object(
                il.pl, "pallas_call",
                lambda *a, **kw: orig(*a, interpret=True, **kw)), \
                mock.patch.object(il, "_FUSED_VMEM_BUDGET", 0):
            got = il.interlevel_interp_pallas(
                q, xq, jnp.asarray(pxyz), jnp.asarray(pf),
                jnp.asarray(dup), K)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_select_kernel_matches_knn(self, rng):
        """interlevel_select_pallas == exact kNN on indices and
        distances (unique semantics via the duplicate mask)."""
        P, G, N, M, K = 2, 2, 8, 48, 5
        q = jnp.asarray(rng.standard_normal((P * G, N, 3)).astype(np.float32))
        pxyz = rng.standard_normal((P, M, 3)).astype(np.float32)
        pxyz[1, 5] = pxyz[1, 2]
        dup = np.zeros((P, M), bool)
        dup[1, 5] = True

        res = knn_group(q.reshape(P, G * N, 3), jnp.asarray(pxyz), K,
                        unique=True, dup_mask=jnp.asarray(dup),
                        method="exact")
        orig = pl.pallas_call
        with mock.patch.object(
                il.pl, "pallas_call",
                lambda *a, **kw: orig(*a, interpret=True, **kw)):
            d, idx = il.interlevel_select_pallas(
                q, jnp.asarray(pxyz), jnp.asarray(dup), K)
        np.testing.assert_array_equal(
            np.asarray(res.idx).reshape(P * G, N, K), np.asarray(idx))
        np.testing.assert_allclose(
            np.asarray(res.dist2).reshape(P * G, N, K), np.asarray(d),
            atol=1e-4)

    def test_fewer_distinct_than_k(self, rng):
        """When a previous set has fewer distinct candidates than k the
        sweeps must fall back to duplicate columns (the XLA sentinel
        path selects duplicates there) — not re-select an extracted
        column.  Regression: the exclusion sentinel used to rank BELOW
        the displaced duplicates."""
        P, G, N, M, K = 1, 2, 8, 16, 5
        q = jnp.asarray(rng.standard_normal((P * G, N, 3)).astype(np.float32))
        pxyz = rng.standard_normal((P, M, 3)).astype(np.float32)
        # only 3 distinct points: rows 3.. copy rows 0-2
        for i in range(3, M):
            pxyz[0, i] = pxyz[0, i % 3]
        dup = np.zeros((P, M), bool)
        dup[0, 3:] = True

        res = knn_group(q.reshape(P, G * N, 3), jnp.asarray(pxyz), K,
                        unique=True, dup_mask=jnp.asarray(dup),
                        method="exact")
        orig = pl.pallas_call
        with mock.patch.object(
                il.pl, "pallas_call",
                lambda *a, **kw: orig(*a, interpret=True, **kw)):
            d, idx = il.interlevel_select_pallas(
                q, jnp.asarray(pxyz), jnp.asarray(dup), K)
        idx = np.asarray(idx)
        # every row: 3 distinct picks then duplicate columns, all
        # in-range, no column repeated
        assert idx.max() < M and idx.min() >= 0
        for row in idx.reshape(-1, K):
            assert len(set(row.tolist())) == K, row
        np.testing.assert_array_equal(
            np.asarray(res.idx).reshape(P * G, N, K)[..., :3],
            idx[..., :3])
        # the duplicate slots carry ~zero weight through the interp:
        # the full outputs of both paths still agree
        C = 12
        xq = jnp.asarray(
            rng.standard_normal((P * G, N, C)).astype(np.float32))
        pf = rng.standard_normal((P, M, C)).astype(np.float32)
        for i in range(3, M):
            pf[0, i] = pf[0, i % 3]
        ref = _xla_reference(q, xq, jnp.asarray(pxyz), jnp.asarray(pf),
                             jnp.asarray(dup), K)
        with mock.patch.object(
                il.pl, "pallas_call",
                lambda *a, **kw: orig(*a, interpret=True, **kw)):
            got = il.interlevel_interp_pallas(
                q, xq, jnp.asarray(pxyz), jnp.asarray(pf),
                jnp.asarray(dup), K)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)

    def test_split_wrapper_consistent(self, rng):
        """The big-M call splitting must not change results."""
        P, G, N, M, C, K = 4, 2, 8, 16, 8, 3
        q = jnp.asarray(rng.standard_normal((P * G, N, 3)).astype(np.float32))
        xq = jnp.asarray(
            rng.standard_normal((P * G, N, C)).astype(np.float32))
        pxyz = jnp.asarray(rng.standard_normal((P, M, 3)).astype(np.float32))
        pf = jnp.asarray(rng.standard_normal((P, M, C)).astype(np.float32))
        dup = jnp.zeros((P, M), bool)

        orig = pl.pallas_call
        with mock.patch.object(
                il.pl, "pallas_call",
                lambda *a, **kw: orig(*a, interpret=True, **kw)):
            whole = il.interlevel_interp_pallas(q, xq, pxyz, pf, dup, K)
            with mock.patch.object(il, "_BIG_M", 8), \
                 mock.patch.object(il, "_MAX_PROGRAMS_BIG_M", 2):
                split = il.interlevel_interp_pallas(q, xq, pxyz, pf,
                                                    dup, K)
        np.testing.assert_allclose(np.asarray(whole), np.asarray(split),
                                   atol=1e-6)

    def test_split_wrapper_group_axis(self, rng):
        """When the sub-patch count alone exceeds the program limit
        (whole-shape patches, e.g. n_sub=160), the wrapper must split
        along the group axis too — not launch >limit programs."""
        P, G, N, M, C, K = 2, 5, 8, 16, 8, 3
        q = jnp.asarray(rng.standard_normal((P * G, N, 3)).astype(np.float32))
        xq = jnp.asarray(
            rng.standard_normal((P * G, N, C)).astype(np.float32))
        pxyz = jnp.asarray(rng.standard_normal((P, M, 3)).astype(np.float32))
        pf = jnp.asarray(rng.standard_normal((P, M, C)).astype(np.float32))
        dup = jnp.zeros((P, M), bool)

        seen_grids = []
        orig = pl.pallas_call

        def spy(*a, **kw):
            seen_grids.append(kw.get("grid"))
            return orig(*a, interpret=True, **kw)

        with mock.patch.object(il.pl, "pallas_call", spy):
            whole = il.interlevel_interp_pallas(q, xq, pxyz, pf, dup, K)
            with mock.patch.object(il, "_BIG_M", 8), \
                 mock.patch.object(il, "_MAX_PROGRAMS_BIG_M", 2):
                split = il.interlevel_interp_pallas(q, xq, pxyz, pf,
                                                    dup, K)
        np.testing.assert_allclose(np.asarray(whole), np.asarray(split),
                                   atol=1e-6)
        # every split-path launch respects the program limit
        for g in seen_grids[1:]:
            assert g[0] * g[1] <= 2, f"grid {g} exceeds program limit"


class TestSweepV2:
    """The V2 sweep restructuring (mutation-based exclusion + 1024
    chunks) must be BIT-identical to V1 — selections, distances, and
    the multi-chunk merge path included."""

    def _run_select(self, v2, q, pxyz, dup, k):
        il.set_sweep_v2(v2)
        jax.clear_caches()
        orig = pl.pallas_call
        try:
            with mock.patch.object(
                    il.pl, "pallas_call",
                    lambda *a, **kw: orig(*a, interpret=True, **kw)):
                return il.interlevel_select_pallas(q, pxyz, dup, k)
        finally:
            il.set_sweep_v2(False)
            jax.clear_caches()

    def test_bit_identical_select_multichunk(self, rng):
        # M=2560 exercises the streamed multi-chunk merge in BOTH
        # layouts (V1: 2 chunks of 2048-pad; V2: 3 chunks of 1024) and
        # duplicates exercise the penalty ties
        P, G, N, M, K = 1, 2, 8, 2560, 5
        q = jnp.asarray(
            rng.standard_normal((P * G, N, 3)).astype(np.float32))
        pxyz = rng.standard_normal((P, M, 3)).astype(np.float32)
        pxyz[0, 100:110] = pxyz[0, 0:10]
        dup = np.zeros((P, M), bool)
        dup[0, 100:110] = True
        d1, i1 = self._run_select(False, q, jnp.asarray(pxyz),
                                  jnp.asarray(dup), K)
        d2, i2 = self._run_select(True, q, jnp.asarray(pxyz),
                                  jnp.asarray(dup), K)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

    def test_bit_identical_fused(self, rng):
        P, G, N, M, C, K = 2, 2, 16, 48, 12, 4
        q = jnp.asarray(
            rng.standard_normal((P * G, N, 3)).astype(np.float32))
        xq = jnp.asarray(
            rng.standard_normal((P * G, N, C)).astype(np.float32))
        pxyz = rng.standard_normal((P, M, 3)).astype(np.float32)
        pxyz[0, 7] = pxyz[0, 3]
        pf = rng.standard_normal((P, M, C)).astype(np.float32)
        pf[0, 7] = pf[0, 3]
        dup = np.zeros((P, M), bool)
        dup[0, 7] = True
        outs = []
        orig = pl.pallas_call
        for v2 in (False, True):
            il.set_sweep_v2(v2)
            jax.clear_caches()
            try:
                with mock.patch.object(
                        il.pl, "pallas_call",
                        lambda *a, **kw: orig(*a, interpret=True, **kw)):
                    outs.append(np.asarray(il.interlevel_interp_pallas(
                        q, xq, jnp.asarray(pxyz), jnp.asarray(pf),
                        jnp.asarray(dup), K)))
            finally:
                il.set_sweep_v2(False)
                jax.clear_caches()
        np.testing.assert_array_equal(outs[0], outs[1])
