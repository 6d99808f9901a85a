"""Randomized consistency sweep: ops vs the numpy oracles across many
shapes, masks, and duplicate patterns.

The per-op unit tests pin a handful of fixed shapes; this sweep walks a
seeded grid of configurations (batch, N, M, C, k, masks, injected
duplicates) so masking/dedup edge cases at odd sizes stay covered.
Where float32-vs-float64 rounding can legitimately flip a selection,
disagreement is accepted only on exact distance ties.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from threepu.ops import knn_group, duplicate_mask
from threepu.ops.ball_query import ball_query
from threepu.ops.chamfer import nn_distance
from threepu.ops.fps import fps_indices

from oracles import (ball_query_oracle, fps_oracle, knn_oracle,
                     nn_distance_oracle)


def _idx_matches_modulo_ties(idx, oidx, dist, odist, atol=1e-5):
    """Selections must agree except where the oracle's ranking has a
    tie at the disagreement point (f32 vs f64 rounding)."""
    if np.array_equal(idx, oidx):
        return True
    same = idx == oidx
    return np.allclose(np.where(same, 0.0, dist),
                       np.where(same, 0.0, odist), atol=atol)


KNN_CASES = [(s, n, m, c, k, dup, uniq)
             for s, (n, m, c, k) in enumerate(
                 [(37, 11, 3, 5), (64, 64, 3, 17), (129, 40, 8, 9),
                  (200, 1, 3, 33), (16, 16, 24, 4), (311, 97, 3, 20)])
             for dup in (False, True)
             for uniq in (False, True)]


@pytest.mark.parametrize("seed,n,m,c,k,dup,uniq", KNN_CASES)
@pytest.mark.parametrize("method", ["exact", "sort"])
def test_knn_vs_oracle(seed, n, m, c, k, dup, uniq, method):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, c)).astype(np.float32)
    if dup:
        # duplicate ~1/3 of rows onto earlier rows
        src = rng.integers(0, n // 2, n // 3)
        dst = n // 2 + rng.permutation(n - n // 2)[:n // 3]
        pts[dst] = pts[src]
    q = rng.standard_normal((m, c)).astype(np.float32)
    k = min(k, (np.unique(pts, axis=0).shape[0] if uniq else n))
    res = knn_group(jnp.asarray(q)[None], jnp.asarray(pts)[None], k,
                    unique=uniq, method=method)
    _, oidx, odist = knn_oracle(q.astype(np.float64),
                                pts.astype(np.float64), k, unique=uniq)
    idx = np.asarray(res.idx[0])
    dist = np.asarray(res.dist2[0])
    assert _idx_matches_modulo_ties(idx, oidx, dist, odist), \
        (seed, n, m, c, k, dup, uniq, method)


@pytest.mark.parametrize("seed,n,m,masked", [
    (0, 23, 7, False), (1, 50, 50, False), (2, 97, 31, True),
    (3, 128, 12, True), (4, 301, 64, True), (5, 64, 1, False)])
def test_fps_vs_oracle(seed, n, m, masked):
    rng = np.random.default_rng(100 + seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    valid = None
    if masked:
        valid = rng.random(n) > 0.3
        valid[rng.integers(0, n)] = True  # at least one valid
        m = min(m, int(valid.sum()))
    got = np.asarray(fps_indices(
        jnp.asarray(pts)[None], m,
        valid_mask=None if valid is None else jnp.asarray(valid)[None]))[0]
    want = fps_oracle(pts.astype(np.float64), m, valid)
    assert np.array_equal(got, want), (seed, n, m, masked)


@pytest.mark.parametrize("seed,n,m", [(0, 13, 29), (1, 80, 80),
                                      (2, 257, 63), (3, 1, 40)])
def test_nn_distance_vs_oracle(seed, n, m):
    rng = np.random.default_rng(200 + seed)
    a = rng.standard_normal((n, 3)).astype(np.float32)
    b = rng.standard_normal((m, 3)).astype(np.float32)
    d1, i1, d2, i2 = nn_distance(jnp.asarray(a)[None], jnp.asarray(b)[None])
    od1, oi1, od2, oi2 = nn_distance_oracle(a.astype(np.float64),
                                            b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(d1)[0], od1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2)[0], od2, atol=1e-5)
    assert np.array_equal(np.asarray(i1)[0], oi1)
    assert np.array_equal(np.asarray(i2)[0], oi2)


@pytest.mark.parametrize("seed,n,m,radius,nsample", [
    (0, 50, 11, 0.8, 6), (1, 100, 30, 0.3, 4), (2, 64, 64, 1.5, 12),
    (3, 40, 5, 0.05, 3)])
def test_ball_query_vs_oracle(seed, n, m, radius, nsample):
    rng = np.random.default_rng(300 + seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    q = rng.standard_normal((m, 3)).astype(np.float32)
    got = np.asarray(ball_query(radius, nsample, jnp.asarray(pts)[None],
                                jnp.asarray(q)[None]))[0]
    want = ball_query_oracle(radius, nsample, pts, q)
    assert np.array_equal(got, want), (seed, n, m)


@pytest.mark.parametrize("seed,n,c,frac", [(0, 17, 3, 0.0), (1, 64, 3, 0.4),
                                           (2, 200, 3, 0.9), (3, 33, 8, 0.5)])
def test_duplicate_mask_vs_unique(seed, n, c, frac):
    rng = np.random.default_rng(400 + seed)
    pts = rng.standard_normal((n, c)).astype(np.float32)
    n_dup = int(n * frac / 2)
    if n_dup:
        src = rng.integers(0, n // 2, n_dup)
        dst = n // 2 + rng.permutation(n - n // 2)[:n_dup]
        pts[dst] = pts[src]
    got = np.asarray(duplicate_mask(jnp.asarray(pts)[None]))[0]
    _, first = np.unique(pts, return_index=True, axis=0)
    want = np.ones(n, bool)
    want[first] = False
    assert np.array_equal(got, want), (seed, n, c, frac)
