"""Fused edge-conv chain kernel vs the XLA decomposed schedule.

The kernel runs in interpret mode on CPU (the module auto-interprets on
non-TPU backends), so these tests execute the exact kernel program the
chip runs; on-hardware equivalence at production sizes is asserted by
``benchmarks/tpu_checks.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import threepu.ops.edgeconv_pallas as ecp
from threepu.models.layers import DenseEdgeConv


@pytest.fixture(autouse=True)
def small_segments(monkeypatch):
    # keep the fixed-size segment padding exercised but cheap under the
    # interpreter (production _SEG=40 is a compile-cost choice)
    monkeypatch.setattr(ecp, "_SEG", 4)


def _pallas_vs_xla(rng, b, n_pts, k, dense_n, g=12, c=24):
    x = jnp.asarray(rng.standard_normal((b, n_pts, c)).astype(np.float32))
    mod = DenseEdgeConv(growth_rate=g, n=dense_n, k=k, fused=True)
    params = mod.init({"params": jax.random.PRNGKey(0)}, x)
    ref, idx_ref = mod.apply(params, x)
    got, idx_got = mod.apply(params, x, pallas=True)
    np.testing.assert_array_equal(np.asarray(idx_got), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-5)


class TestEdgeConvChainKernel:
    def test_matches_xla_fused(self, rng):
        _pallas_vs_xla(rng, b=2, n_pts=40, k=8, dense_n=3)

    def test_dense_n_variants(self, rng):
        _pallas_vs_xla(rng, b=1, n_pts=24, k=5, dense_n=1)
        _pallas_vs_xla(rng, b=1, n_pts=24, k=5, dense_n=2)

    def test_segment_padding(self, rng):
        # b=6 > _SEG=4: two segments, the second padded
        _pallas_vs_xla(rng, b=6, n_pts=16, k=4, dense_n=3)

    def test_full_cascade(self, rng, monkeypatch):
        """Net.upsample with the kernel enabled matches the XLA path
        through the whole repatch/merge cascade."""
        from threepu.models import Net

        xyz = jnp.asarray(
            rng.standard_normal((2, 48, 3)).astype(np.float32))
        net = Net(max_up_ratio=4, knn=6, max_num_point=48, dedup=False)
        params = net.init(
            {"params": jax.random.PRNGKey(0), "patch": jax.random.PRNGKey(1)},
            xyz, 4, gt=jnp.zeros((2, 192, 3)), train=True)["params"]
        ref = net.apply({"params": params}, xyz, 4, train=False)
        monkeypatch.setattr(ecp, "FORCE", True)
        got = net.apply({"params": params}, xyz, 4, train=False)
        # the ~1e-5 hi/lo gather rounding can flip kNN/FPS near-ties on
        # random data (like the documented bucketed-vs-exact case), so
        # assert row-level agreement for the overwhelming majority and
        # set-level agreement (Chamfer) overall
        ref_np, got_np = np.asarray(ref), np.asarray(got)
        row_close = np.all(np.abs(got_np - ref_np) < 5e-4, axis=-1)
        assert row_close.mean() > 0.98
        for b in range(ref_np.shape[0]):
            d = np.sum((got_np[b][:, None] - ref_np[b][None]) ** 2, -1)
            chamfer = d.min(1).mean() + d.min(0).mean()
            assert chamfer < 1e-5

    def test_matches_naive_schedule(self, rng):
        """Transitively: kernel == decomposed == naive edge-tensor
        schedule, all sharing one param tree."""
        x = jnp.asarray(rng.standard_normal((2, 32, 24)).astype(np.float32))
        fused = DenseEdgeConv(growth_rate=12, n=3, k=6, fused=True)
        naive = DenseEdgeConv(growth_rate=12, n=3, k=6, fused=False)
        params = fused.init({"params": jax.random.PRNGKey(1)}, x)
        yk, _ = fused.apply(params, x, pallas=True)
        yn, _ = naive.apply(params, x)
        np.testing.assert_allclose(np.asarray(yk), np.asarray(yn),
                                   atol=5e-5, rtol=1e-5)
