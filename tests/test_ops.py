import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threepu import ops
from oracles import (fps_oracle, knn_oracle, nn_distance_oracle,
                     ball_query_oracle, normalize_oracle)


class TestPairwiseDist:
    def test_matches_direct(self, rng):
        a = rng.standard_normal((2, 50, 3)).astype(np.float32)
        b = rng.standard_normal((2, 70, 3)).astype(np.float32)
        d = ops.pairwise_dist2(jnp.asarray(a), jnp.asarray(b))
        ref = np.sum((a[:, :, None] - b[:, None]) ** 2, -1)
        np.testing.assert_allclose(np.asarray(d), ref, atol=1e-4)

    def test_direct_exact_zero_on_equal_rows(self, rng):
        a = rng.standard_normal((1, 8, 3)).astype(np.float32)
        d = ops.direct_dist2(jnp.asarray(a), jnp.asarray(a))
        assert np.all(np.diagonal(np.asarray(d), axis1=1, axis2=2) == 0.0)


class TestDuplicateMask:
    def test_marks_later_occurrences(self, rng):
        pts = rng.standard_normal((20, 3)).astype(np.float32)
        pts[5] = pts[2]
        pts[11] = pts[2]
        pts[17] = pts[9]
        mask = np.asarray(ops.duplicate_mask(jnp.asarray(pts)))
        expected = np.zeros(20, bool)
        expected[[5, 11, 17]] = True
        np.testing.assert_array_equal(mask, expected)

    def test_batched(self, rng):
        pts = rng.standard_normal((3, 300, 4)).astype(np.float32)
        pts[1, 250] = pts[1, 3]
        mask = np.asarray(ops.duplicate_mask(jnp.asarray(pts)))
        assert mask[1, 250] and mask.sum() == 1

    def test_matches_quadratic_oracle(self, rng):
        """The sort-based implementation must agree with the direct
        O(N^2) definition, including multi-duplicate runs, -0.0 == +0.0,
        and near-misses differing only in the last column."""
        pts = rng.standard_normal((2, 64, 3)).astype(np.float32)
        pts[0, 10] = pts[0, 4]
        pts[0, 20] = pts[0, 4]         # triple run
        pts[0, 30] = pts[0, 4]
        pts[1, 5] = [0.5, 0.25, 1.0]
        pts[1, 40] = [0.5, 0.25, 1.0]  # duplicate
        pts[1, 41] = [0.5, 0.25, 1.5]  # same x,y, different z
        pts[1, 7] = [0.0, 1.0, 2.0]
        pts[1, 8] = [-0.0, 1.0, 2.0]   # IEEE-equal row
        import threepu.ops.distances as dmod
        import unittest.mock as mock
        direct = np.asarray(ops.duplicate_mask(jnp.asarray(pts)))
        with mock.patch.object(dmod, "_DIRECT_MAX_N", 0):
            sorted_ = np.asarray(ops.duplicate_mask(jnp.asarray(pts)))
        for b in range(2):
            eq = np.all(pts[b][:, None] == pts[b][None, :], axis=-1)
            earlier = np.arange(64)[None, :] < np.arange(64)[:, None]
            expected = np.any(eq & earlier, axis=-1)
            np.testing.assert_array_equal(direct[b], expected)
            np.testing.assert_array_equal(sorted_[b], expected)


class TestKnn:
    def test_matches_oracle(self, rng):
        q = rng.standard_normal((2, 30, 3)).astype(np.float32)
        p = rng.standard_normal((2, 100, 3)).astype(np.float32)
        res = ops.knn_group(jnp.asarray(q), jnp.asarray(p), 5)
        for b in range(2):
            nbrs, idx, dist = knn_oracle(q[b], p[b], 5)
            np.testing.assert_array_equal(np.asarray(res.idx[b]), idx)
            np.testing.assert_allclose(np.asarray(res.dist2[b]), dist,
                                       atol=1e-3)
            np.testing.assert_allclose(np.asarray(res.neighbors[b]), nbrs,
                                       atol=1e-5)

    def test_unique_pushes_duplicates_last(self, rng):
        p = rng.standard_normal((1, 40, 3)).astype(np.float32)
        p[0, 7] = p[0, 3]  # duplicate pair
        q = p[:, 3:4, :]
        res = ops.knn_group(jnp.asarray(q), jnp.asarray(p), 40, unique=True)
        idx = np.asarray(res.idx[0, 0])
        # first occurrence (3) must come first; duplicate (7) ranks last
        assert idx[0] == 3
        assert idx[-1] == 7

    def test_valid_mask_excludes(self, rng):
        p = rng.standard_normal((1, 50, 3)).astype(np.float32)
        q = p[:, :4]
        mask = np.ones((1, 50), bool)
        mask[0, :25] = False  # first half invalid (incl. the queries)
        res = ops.knn_group(jnp.asarray(q), jnp.asarray(p), 10,
                            valid_mask=jnp.asarray(mask))
        assert np.all(np.asarray(res.idx) >= 25)

    def test_nchw_wrapper_layout(self, rng):
        q = rng.standard_normal((2, 3, 10)).astype(np.float32)
        p = rng.standard_normal((2, 3, 40)).astype(np.float32)
        nbrs, idx, dist = ops.group_knn(4, jnp.asarray(q), jnp.asarray(p),
                                        unique=False, NCHW=True)
        assert nbrs.shape == (2, 3, 10, 4)
        assert idx.shape == (2, 10, 4)
        assert dist.shape == (2, 10, 4)


class TestFps:
    def test_matches_oracle(self, rng):
        pts = rng.standard_normal((2, 200, 3)).astype(np.float32)
        idx = np.asarray(ops.fps_indices(jnp.asarray(pts), 50))
        for b in range(2):
            np.testing.assert_array_equal(idx[b], fps_oracle(pts[b], 50))

    def test_first_index_is_zero(self, rng):
        pts = rng.standard_normal((1, 64, 3)).astype(np.float32)
        idx = np.asarray(ops.fps_indices(jnp.asarray(pts), 10))
        assert idx[0, 0] == 0

    def test_valid_mask(self, rng):
        pts = rng.standard_normal((1, 100, 3)).astype(np.float32)
        valid = np.ones((1, 100), bool)
        valid[0, :30] = False
        idx = np.asarray(ops.fps_indices(jnp.asarray(pts), 20,
                                         valid_mask=jnp.asarray(valid)))
        assert np.all(idx >= 30)
        np.testing.assert_array_equal(
            idx[0], fps_oracle(pts[0], 20, valid=valid[0]))

    def test_wrapper_gathers_points(self, rng):
        pts = rng.standard_normal((2, 3, 80)).astype(np.float32)
        idx, sampled = ops.furthest_point_sample(jnp.asarray(pts), 12)
        assert sampled.shape == (2, 3, 12)
        np.testing.assert_allclose(
            np.asarray(sampled[0, :, 0]), pts[0, :, idx[0, 0]])

    def test_pallas_parity_interpret(self, rng):
        """Pallas kernel (interpret mode on CPU) matches the XLA path."""
        from threepu.ops.fps_pallas import fps_pallas
        import threepu.ops.fps_pallas as fp
        pts = rng.standard_normal((2, 300, 3)).astype(np.float32)
        want = np.asarray(ops.fps_indices(jnp.asarray(pts), 40))
        import unittest.mock as mock
        from jax.experimental import pallas as pl
        orig = pl.pallas_call
        with mock.patch.object(fp.pl, "pallas_call",
                               lambda *a, **k: orig(*a, interpret=True, **k)):
            got = np.asarray(fps_pallas(jnp.asarray(pts), 40))
        np.testing.assert_array_equal(got, want)


class TestGather:
    def test_forward(self, rng):
        feats = rng.standard_normal((2, 4, 30)).astype(np.float32)
        idx = rng.integers(0, 30, (2, 7))
        out = ops.gather_points(jnp.asarray(feats),
                                jnp.asarray(idx, dtype=jnp.int32))
        for b in range(2):
            np.testing.assert_array_equal(np.asarray(out[b]),
                                          feats[b][:, idx[b]])

    def test_gradient_scatter_add(self, rng):
        feats = jnp.asarray(rng.standard_normal((1, 2, 5)).astype(np.float32))
        idx = jnp.asarray([[1, 1, 3]], dtype=jnp.int32)

        def f(x):
            return jnp.sum(ops.gather_points(x, idx))

        g = np.asarray(jax.grad(f)(feats))
        expected = np.zeros((1, 2, 5), np.float32)
        expected[0, :, 1] = 2.0  # index 1 gathered twice
        expected[0, :, 3] = 1.0
        np.testing.assert_array_equal(g, expected)

    def test_onehot_matches_take(self, rng):
        """The one-hot MXU gather (the TPU fast path of batched_gather)
        must be bit-exact vs the native gather: each output row is a
        single 1.0 * x product under HIGHEST precision."""
        from threepu.ops.gather import batched_gather
        pts = jnp.asarray(rng.standard_normal((3, 40, 12)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 40, (3, 17, 5)), jnp.int32)
        take = batched_gather(pts, idx, method="take")
        onehot = batched_gather(pts, idx, method="onehot")
        np.testing.assert_array_equal(np.asarray(take), np.asarray(onehot))
        # gradients: transposed matmul == scatter-add
        f_take = lambda p: jnp.sum(
            batched_gather(p, idx, method="take") ** 2)
        f_oh = lambda p: jnp.sum(
            batched_gather(p, idx, method="onehot") ** 2)
        g_take = np.asarray(jax.grad(f_take)(pts))
        g_oh = np.asarray(jax.grad(f_oh)(pts))
        np.testing.assert_allclose(g_take, g_oh, rtol=1e-6, atol=1e-6)
        # bf16 points: single-term sums stay exact
        pts16 = pts.astype(jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(batched_gather(pts16, idx, method="take")),
            np.asarray(batched_gather(pts16, idx, method="onehot")))

    def test_onehot_segmented(self, rng, monkeypatch):
        """The one-hot operand is split along the index axis past the
        byte bound (the train-batch-32 cliff fix); segmented results
        must stay bit-equal to unsegmented, including non-divisible
        segment boundaries."""
        import threepu.ops.gather as gm
        pts = jnp.asarray(rng.standard_normal((2, 40, 6)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 40, (2, 13, 3)), jnp.int32)
        whole = gm.batched_gather(pts, idx, method="onehot")
        # bound small enough to force multiple ragged segments:
        # batch*m*4 = 320 bytes -> seg = 3 of X=39 -> 13 segments
        monkeypatch.setattr(gm, "_ONEHOT_MAX_BYTES", 1000)
        seg = gm.batched_gather(pts, idx, method="onehot")
        np.testing.assert_array_equal(np.asarray(whole), np.asarray(seg))
        np.testing.assert_array_equal(
            np.asarray(gm.batched_gather(pts, idx, method="take")),
            np.asarray(seg))

    def test_transposed_matches_take(self, rng):
        """batched_gather_t (the transposed-output one-hot gather used
        by the edge-conv chain) must be bit-exact vs the native gather:
        the f32 operand splits into three bf16 planes that sum back
        exactly, and each one-hot product is a single 1.0 * x term."""
        from threepu.ops.gather import batched_gather, batched_gather_t
        pts = jnp.asarray(rng.standard_normal((3, 40, 12)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 40, (3, 17, 5)), jnp.int32)
        ref = batched_gather(pts, idx, method="take")        # (3,17,5,12)
        ref_t = np.swapaxes(np.asarray(ref).reshape(3, 85, 12), -1, -2)
        for method in ("take", "onehot"):
            out = batched_gather_t(pts, idx, method=method)
            assert out.shape == (3, 12, 85)
            np.testing.assert_array_equal(np.asarray(out), ref_t)
        # bf16 points: single-pass path
        pts16 = pts.astype(jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(batched_gather_t(pts16, idx, method="onehot")),
            np.swapaxes(np.asarray(batched_gather(
                pts16, idx, method="take")).reshape(3, 85, 12), -1, -2))

    def test_transposed_segmented(self, rng, monkeypatch):
        """Segmentation along the lane axis stays bit-equal across
        ragged segment boundaries."""
        import threepu.ops.gather as gm
        pts = jnp.asarray(rng.standard_normal((2, 40, 6)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 40, (2, 13, 3)), jnp.int32)
        whole = gm.batched_gather_t(pts, idx, method="onehot")
        monkeypatch.setattr(gm, "_ONEHOT_MAX_BYTES", 500)
        seg = gm.batched_gather_t(pts, idx, method="onehot")
        np.testing.assert_array_equal(np.asarray(whole), np.asarray(seg))

    def test_gradcheck(self, rng):
        """Finite-difference check mirroring the reference gradcheck
        (network/operations.py:354-359)."""
        feats = rng.standard_normal((1, 3, 6)).astype(np.float64)
        idx = jnp.asarray([[0, 2, 2, 5]], dtype=jnp.int32)
        v = rng.standard_normal((1, 3, 4))

        def f(x):
            return jnp.vdot(ops.gather_points(x, idx), jnp.asarray(v))

        g = jax.grad(f)(jnp.asarray(feats))
        eps = 1e-6
        for c in range(3):
            for n in range(6):
                fp = feats.copy(); fp[0, c, n] += eps
                fm = feats.copy(); fm[0, c, n] -= eps
                num = (f(jnp.asarray(fp)) - f(jnp.asarray(fm))) / (2 * eps)
                np.testing.assert_allclose(g[0, c, n], num, atol=1e-4)


class TestBallQuery:
    def test_matches_oracle(self, rng):
        pts = rng.uniform(-1, 1, (2, 60, 3)).astype(np.float32)
        q = rng.uniform(-1, 1, (2, 9, 3)).astype(np.float32)
        out = np.asarray(ops.ball_query(0.7, 6, jnp.asarray(pts),
                                        jnp.asarray(q)))
        for b in range(2):
            np.testing.assert_array_equal(
                out[b], ball_query_oracle(0.7, 6, pts[b], q[b]))

    def test_no_hits_returns_zero(self):
        pts = jnp.ones((1, 10, 3))
        q = jnp.zeros((1, 2, 3)) + 100.0
        out = np.asarray(ops.ball_query(0.1, 4, pts, q))
        np.testing.assert_array_equal(out, np.zeros((1, 2, 4), np.int32))


class TestNormalize:
    def test_matches_oracle(self, rng):
        pc = rng.standard_normal((3, 40, 3)).astype(np.float32) * 5 + 2
        out, c, r = ops.normalize_point_batch_cl(jnp.asarray(pc))
        eo, ec, er = normalize_oracle(pc)
        np.testing.assert_allclose(np.asarray(out), eo, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c), ec, atol=1e-5)
        np.testing.assert_allclose(np.asarray(r), er, atol=1e-5)

    def test_nchw_roundtrip(self, rng):
        pc = rng.standard_normal((2, 3, 25)).astype(np.float32)
        out, c, r = ops.normalize_point_batch(jnp.asarray(pc), NCHW=True)
        assert out.shape == (2, 3, 25)
        assert c.shape == (2, 3, 1)
        assert r.shape == (2, 1, 1)
        restored = np.asarray(out) * np.asarray(r) + np.asarray(c)
        np.testing.assert_allclose(restored, pc, atol=1e-5)


class TestNnDistance:
    def test_matches_oracle(self, rng):
        a = rng.standard_normal((2, 33, 3)).astype(np.float32)
        b = rng.standard_normal((2, 47, 3)).astype(np.float32)
        d1, i1, d2, i2 = ops.nn_distance(jnp.asarray(a), jnp.asarray(b),
                                         16)
        for k in range(2):
            ed1, ei1, ed2, ei2 = nn_distance_oracle(a[k], b[k])
            np.testing.assert_allclose(np.asarray(d1[k]), ed1, atol=1e-4)
            np.testing.assert_array_equal(np.asarray(i1[k]), ei1)
            np.testing.assert_allclose(np.asarray(d2[k]), ed2, atol=1e-4)
            np.testing.assert_array_equal(np.asarray(i2[k]), ei2)

    def test_gradcheck(self, rng):
        """Finite differences, mirroring the reference gradcheck at
        network/model_loss.py:88-99."""
        a = rng.standard_normal((1, 12, 3))
        b = rng.standard_normal((1, 15, 3))

        def loss(x1, x2):
            d1, _, d2, _ = ops.nn_distance(x1, x2, 8)
            return jnp.sum(d1) + 0.7 * jnp.sum(d2)

        ga, gb = jax.grad(loss, argnums=(0, 1))(jnp.asarray(a),
                                                jnp.asarray(b))
        eps = 1e-6
        for arr, g, which in ((a, ga, 0), (b, gb, 1)):
            flat = arr.copy()
            for i in [0, 5, 11]:
                for c in range(3):
                    p = flat.copy(); p[0, i, c] += eps
                    m = flat.copy(); m[0, i, c] -= eps
                    args_p = (jnp.asarray(p), jnp.asarray(b)) if which == 0 \
                        else (jnp.asarray(a), jnp.asarray(p))
                    args_m = (jnp.asarray(m), jnp.asarray(b)) if which == 0 \
                        else (jnp.asarray(a), jnp.asarray(m))
                    num = (loss(*args_p) - loss(*args_m)) / (2 * eps)
                    np.testing.assert_allclose(
                        np.asarray(g)[0, i, c], num, atol=1e-4,
                        err_msg=f"arg{which} point {i} coord {c}")


class TestKnnApprox:
    def test_approx_recall_and_api(self, rng):
        """method='approx' (TPU partial-reduce top-k) keeps high recall
        vs exact; 'auto' stays exact on CPU."""
        q = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
        p = jnp.asarray(
            rng.standard_normal((2, 4096, 3)).astype(np.float32))
        exact = ops.knn_group(q, p, 5, method="exact")
        approx = ops.knn_group(q, p, 5, method="approx",
                               recall_target=0.95)
        hit = (approx.idx[..., :, None] == exact.idx[..., None, :])
        recall = float(jnp.mean(jnp.any(hit, axis=-1)))
        assert recall >= 0.9
        auto = ops.knn_group(q, p, 5)  # auto -> exact on CPU backend
        np.testing.assert_array_equal(np.asarray(auto.idx),
                                      np.asarray(exact.idx))

    def test_unknown_method_raises(self, rng):
        q = jnp.asarray(rng.standard_normal((1, 4, 3)).astype(np.float32))
        with pytest.raises(ValueError):
            ops.knn_group(q, q, 2, method="bogus")


class TestSplitSelect:
    """The two-stage exact selection (`ops/knn.py::_split_select`) must
    be bit-identical to direct lax.top_k — values AND indices, i.e.
    identical tie-breaking — under mass ties (the dedup penalty columns
    are exactly such a tie group at 1e30)."""

    def _cases(self, rng):
        n = 312
        # quantized values force many value ties; a block of 1e30
        # penalty columns reproduces the unique/valid sentinel pattern
        d = rng.integers(0, 40, (4, 37, n)).astype(np.float32)
        d[..., rng.permutation(n)[:64]] = 1e30
        yield jnp.asarray(d)
        # all-tied row (every candidate equal): pure index ordering
        yield jnp.ones((2, 5, n), jnp.float32)
        # real distance matrix with exact duplicate points
        pts = rng.standard_normal((2, n, 3)).astype(np.float32)
        pts[:, 1::7] = pts[:, 0::7]  # duplicates -> exact distance ties
        pts_j = jnp.asarray(pts)
        yield ops.distances.pairwise_dist2(pts_j, pts_j)

    def test_bit_identical_to_topk(self, rng):
        from threepu.ops.knn import _split_select
        k = 33
        for d in self._cases(rng):
            ref_v, ref_i = jax.lax.top_k(-d, k)
            for s in (2, 3, 4, 6, 8):
                v, i = _split_select(d, k, s)
                np.testing.assert_array_equal(np.asarray(i),
                                              np.asarray(ref_i), err_msg=f"s={s}")
                np.testing.assert_array_equal(np.asarray(v),
                                              np.asarray(-ref_v), err_msg=f"s={s}")

    def test_exact_select_dispatch_and_fallback(self, rng):
        """EXACT_SPLITS engages only when n % s == 0 and k fits in a
        split; otherwise the direct path runs — results identical
        either way."""
        from threepu.ops import knn as knn_mod
        d = jnp.asarray(
            rng.standard_normal((3, 8, 310)).astype(np.float32))  # 310 % 4 != 0
        d312 = jnp.asarray(
            rng.standard_normal((3, 8, 312)).astype(np.float32))
        ref310 = jax.lax.top_k(-d, 5)[1]
        ref312 = jax.lax.top_k(-d312, 5)[1]
        knn_mod.set_exact_splits(4)
        try:
            np.testing.assert_array_equal(
                np.asarray(knn_mod._exact_select(d, 5)[1]),
                np.asarray(ref310))
            np.testing.assert_array_equal(
                np.asarray(knn_mod._exact_select(d312, 5)[1]),
                np.asarray(ref312))
            # end-to-end: knn_group with splits on == splits off
            q = jnp.asarray(
                rng.standard_normal((2, 20, 3)).astype(np.float32))
            p = jnp.asarray(
                rng.standard_normal((2, 312, 3)).astype(np.float32))
            with_split = ops.knn_group(q, p, 8, unique=True)
            knn_mod.set_exact_splits(0)
            without = ops.knn_group(q, p, 8, unique=True)
            np.testing.assert_array_equal(np.asarray(with_split.idx),
                                          np.asarray(without.idx))
        finally:
            knn_mod.set_exact_splits(0)


class TestSelectPallas:
    """The Pallas min-extraction selection kernel
    (`ops/select_pallas.py`) must be bit-identical to direct
    lax.top_k — values AND indices, i.e. identical tie-breaking — on
    the same tie-heavy cases as TestSplitSelect (interpret mode; the
    real-hardware twin lives in `benchmarks/tpu_checks.py`)."""

    def _cases(self, rng):
        n = 312
        d = rng.integers(0, 40, (4, 37, n)).astype(np.float32)
        d[..., rng.permutation(n)[:64]] = 1e30  # dedup penalty block
        yield jnp.asarray(d), 33
        yield jnp.ones((2, 5, n), jnp.float32), 7        # all ties
        yield jnp.asarray(                                # 2D, n%128!=0
            rng.standard_normal((8, 200)).astype(np.float32)), 5
        pts = rng.standard_normal((2, n, 3)).astype(np.float32)
        pts[:, 1::7] = pts[:, 0::7]  # duplicate points -> exact ties
        pts_j = jnp.asarray(pts)
        yield ops.distances.pairwise_dist2(pts_j, pts_j), 33

    def test_bit_identical_to_topk(self, rng):
        from threepu.ops.select_pallas import select_pallas
        for d, k in self._cases(rng):
            ref_v, ref_i = jax.lax.top_k(-d, k)
            v, i = select_pallas(d, k, interpret=True)
            np.testing.assert_array_equal(np.asarray(i),
                                          np.asarray(ref_i))
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(-ref_v))

    def test_k_exceeds_n_raises(self, rng):
        from threepu.ops.select_pallas import select_pallas
        with pytest.raises(ValueError, match="exceeds"):
            select_pallas(jnp.ones((2, 4, 8)), 9, interpret=True)

    def test_row_tile_boundary(self):
        """Pin the VMEM dispatch model (the round-4 on-chip OOM: a
        (624, 640) block passed the old gate but Mosaic's ~53 B/element
        scoped-VMEM footprint blew the 16 MB limit — chip_queue_r4e).
        The kernel must now row-tile anything over _MAX_TILE_ELEMS and
        fall back to top_k when one 8-row chunk cannot fit."""
        from threepu.ops.select_pallas import _row_tile, _MAX_TILE_ELEMS
        assert _MAX_TILE_ELEMS <= 1 << 17  # ~6.9 MB at 53 B/element
        assert _row_tile(312, 384) == 312          # conv site: whole block
        assert _row_tile(341, 384) == 341          # == budget exactly
        assert _row_tile(342, 384) == 336          # just over: 8-aligned tile
        t = _row_tile(624, 640)                    # the r4e OOM shape
        assert 0 < t < 624 and t % 8 == 0
        assert t * 640 <= _MAX_TILE_ELEMS
        assert _row_tile(8, 16384) == 8            # minimal chunk fits exactly
        assert _row_tile(8, 16512) == 0            # n alone overflows: top_k

    def test_row_tiled_matches_topk(self, rng):
        """The row-tiled path (blocks over _MAX_TILE_ELEMS) must stay
        bit-identical to top_k — the exact tpu_checks case that OOM'd
        on chip in round 4: (8, 624, n->pad 640) k=33 with a dedup
        penalty tie block, plus a non-dividing m (row padding)."""
        from threepu.ops.select_pallas import select_pallas, _row_tile
        for bsz, m, n, k in [(8, 624, 633, 33), (2, 725, 640, 17)]:
            assert 0 < _row_tile(m, -(-n // 128) * 128) < m
            d_np = rng.standard_normal((bsz, m, n)).astype(np.float32) ** 2
            d_np[..., :64] = 1e30  # dedup-penalty tie block
            d = jnp.asarray(d_np)
            ref_v, ref_i = jax.lax.top_k(-d, k)
            v, i = select_pallas(d, k, interpret=True)
            np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
            np.testing.assert_array_equal(np.asarray(v), np.asarray(-ref_v))

    def test_huge_n_falls_back_to_topk(self, rng):
        """n past the one-chunk budget: transparent bit-identical
        lax.top_k fallback (compiles at any shape, like the
        reference's torch.topk at network/operations.py:207)."""
        from threepu.ops.select_pallas import select_pallas
        d = jnp.asarray(
            rng.standard_normal((2, 8, 16650)).astype(np.float32))
        ref_v, ref_i = jax.lax.top_k(-d, 4)
        v, i = select_pallas(d, 4, interpret=True)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(-ref_v))

    def test_dispatch_gating(self, rng):
        """The knob routes through the kernel only on TPU (trace-time
        backend check): on CPU the direct path must run and results
        stay identical with the knob on."""
        from threepu.ops import knn as knn_mod
        d = jnp.asarray(
            rng.standard_normal((3, 8, 312)).astype(np.float32))
        ref = jax.lax.top_k(-d, 5)[1]
        saved = knn_mod.EXACT_SELECT_PALLAS
        knn_mod.set_exact_select_pallas(True)
        try:
            np.testing.assert_array_equal(
                np.asarray(knn_mod._exact_select(d, 5)[1]),
                np.asarray(ref))
        finally:
            knn_mod.set_exact_select_pallas(saved)


class TestNnDistancePallas:
    def test_interpret_matches_xla(self, rng):
        """Pallas nn_distance kernel (interpret mode) vs the chunked XLA
        path."""
        import unittest.mock as mock
        from jax.experimental import pallas as pl
        import threepu.ops.chamfer_pallas as cp
        a = jnp.asarray(rng.standard_normal((2, 300, 3)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((2, 500, 3)).astype(np.float32))
        d_ref, i_ref = ops.nn_distance(a, b, 128)[:2]
        orig = pl.pallas_call
        with mock.patch.object(cp.pl, "pallas_call",
                               lambda *x, **k: orig(*x, interpret=True, **k)):
            d, i = cp.nn_one_way_pallas(a, b)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref),
                                   atol=1e-4)


class TestHierarchicalFps:
    def test_partitions_and_counts(self, rng):
        """Hierarchical FPS (interpret-mode pallas) returns m valid,
        distinct, well-spread indices."""
        import unittest.mock as mock
        from jax.experimental import pallas as pl
        import threepu.ops.fps_pallas as fp
        from threepu.ops.fps import fps_hierarchical
        pts = jnp.asarray(rng.standard_normal((1, 1000, 3)).astype(np.float32))
        orig = pl.pallas_call
        with mock.patch.object(fp.pl, "pallas_call",
                               lambda *a, **k: orig(*a, interpret=True, **k)):
            idx = np.asarray(fps_hierarchical(pts, 100, group_max=256, use_pallas=True))
        assert idx.shape == (1, 100)
        assert len(np.unique(idx[0])) == 100
        assert idx.min() >= 0 and idx.max() < 1000

    def test_masked_picks_stay_valid(self, rng):
        """Invalid (padded) points must never be selected — including
        when Morton sorting concentrates them into all-invalid groups
        (the validity-stable reorder before truncation)."""
        import unittest.mock as mock
        from jax.experimental import pallas as pl
        import threepu.ops.fps_pallas as fp
        from threepu.ops.fps import fps_hierarchical
        pts = rng.standard_normal((1, 1024, 3)).astype(np.float32)
        pts[:, 600:] = 50.0  # "padding" far away, all identical
        mask = jnp.asarray(np.arange(1024)[None, :] < 600)
        orig = pl.pallas_call
        with mock.patch.object(fp.pl, "pallas_call",
                               lambda *a, **k: orig(*a, interpret=True, **k)):
            # morton + balanced placement guarantees every group holds
            # ~n_valid/G valid points, so all m picks are valid
            idx = np.asarray(fps_hierarchical(
                jnp.asarray(pts), 120, valid_mask=mask,
                group_max=256, sort="morton", use_pallas=True))
            assert idx.shape == (1, 120)
            assert idx.max() < 600
            assert len(np.unique(idx[0])) == 120
            # "none" keeps input order: here all 424 invalid points sit
            # in the last ~1.7 groups, so only 3 * m_per = 90 valid
            # picks exist; the validity-stable reorder must put them
            # first (invalid leakage only after the valid supply is
            # exhausted — the documented limit of unsorted grouping)
            idx = np.asarray(fps_hierarchical(
                jnp.asarray(pts), 120, valid_mask=mask,
                group_max=256, sort="none", use_pallas=True))
            assert idx[0, :90].max() < 600
            assert len(np.unique(idx[0, :90])) == 90

    def test_morton_improves_coverage(self, rng):
        """Z-order grouping must beat unsorted grouping on the FPS
        minimax objective (coverage radius) on a clustered cloud."""
        import unittest.mock as mock
        from jax.experimental import pallas as pl
        import threepu.ops.fps_pallas as fp
        from threepu.ops.fps import fps_hierarchical
        centers = rng.standard_normal((64, 3)).astype(np.float32)
        cloud = (centers[:, None, :]
                 + rng.standard_normal((64, 16, 3)).astype(np.float32)
                 * 0.05).reshape(1, 1024, 3)
        rng.shuffle(cloud[0])
        orig = pl.pallas_call

        def coverage(idx):
            sel = cloud[0][idx[0]]
            d = np.min(np.sum(
                (cloud[0][:, None] - sel[None]) ** 2, -1), axis=1)
            return float(np.sqrt(d.max()))

        with mock.patch.object(fp.pl, "pallas_call",
                               lambda *a, **k: orig(*a, interpret=True, **k)):
            cov_m = coverage(np.asarray(fps_hierarchical(
                jnp.asarray(cloud), 128, group_max=256, sort="morton", use_pallas=True)))
            cov_n = coverage(np.asarray(fps_hierarchical(
                jnp.asarray(cloud), 128, group_max=256, sort="none", use_pallas=True)))
        assert cov_m < cov_n
