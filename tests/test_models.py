import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threepu.models import (DenseEdgeConv, Level, Net,
                            AdaptiveLevel, exponential_distance)
from threepu.losses import ChamferLoss, chamfer_loss
from oracles import nn_distance_oracle


def _init(module, *args, rngs=None, **kwargs):
    rngs = rngs or {"params": jax.random.PRNGKey(0)}
    return module.init(rngs, *args, **kwargs)


class TestDenseEdgeConv:
    def test_output_channels(self, rng):
        """in + growth*n: 24 -> 60 with growth 12, n 3 (the reference
        Level schedule, network/upsampler.py:212-224)."""
        x = jnp.asarray(rng.standard_normal((2, 40, 24)).astype(np.float32))
        mod = DenseEdgeConv(growth_rate=12, n=3, k=8)
        params = _init(mod, x)
        y, idx = mod.apply(params, x)
        assert y.shape == (2, 40, 60)
        assert idx.shape == (2, 40, 8)

    def test_knn_graph_drops_self(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 30, 24)).astype(np.float32))
        mod = DenseEdgeConv(growth_rate=4, n=2, k=5)
        params = _init(mod, x)
        _, idx = mod.apply(params, x)
        self_idx = jnp.arange(30)[None, :, None]
        assert not bool(jnp.any(idx == self_idx))

    def test_oracle_forward(self, rng):
        """Independent numpy re-derivation of the dense-concat schedule."""
        x = rng.standard_normal((1, 12, 6)).astype(np.float32)
        mod = DenseEdgeConv(growth_rate=3, n=3, k=4)
        params = _init(mod, jnp.asarray(x))
        y, idx = mod.apply(params, jnp.asarray(x))
        p = jax.tree.map(np.asarray, params["params"])
        idx = np.asarray(idx)

        # numpy forward
        def dense(name, v):
            return v @ p[name]["kernel"] + p[name]["bias"]

        nbrs = x[0][idx[0]]                      # (N, k, C)
        center = np.repeat(x[0][:, None, :], 4, axis=1)
        edge = np.concatenate([center, nbrs - center], -1)
        y0 = np.concatenate([np.maximum(dense("mlps_0", edge), 0), center], -1)
        y1 = np.concatenate([np.maximum(dense("mlps_1", y0), 0), y0], -1)
        y2 = np.concatenate([dense("mlps_2", y1), y1], -1)
        expect = y2.max(axis=1)
        np.testing.assert_allclose(np.asarray(y[0]), expect, atol=1e-4)


class TestExponentialDistance:
    def test_matches_reference_formula(self, rng):
        pts = jnp.asarray(rng.standard_normal((2, 10, 3)))
        nbrs = jnp.asarray(rng.standard_normal((2, 10, 4, 3)))
        d, w = exponential_distance(pts, nbrs)
        dn = np.sum((np.asarray(pts)[:, :, None] - np.asarray(nbrs)) ** 2, -1)
        h = dn.min(-1, keepdims=True).mean(-2, keepdims=True)
        np.testing.assert_allclose(np.asarray(d), dn, atol=1e-6)
        np.testing.assert_allclose(np.asarray(w), np.exp(-dn / (h / 2)),
                                   atol=1e-6)

    def test_weights_are_stop_gradiented(self, rng):
        pts = jnp.asarray(rng.standard_normal((1, 6, 3)))
        nbrs = jnp.asarray(rng.standard_normal((1, 6, 3, 3)))

        def f(p):
            _, w = exponential_distance(p, nbrs)
            return jnp.sum(w)

        g = jax.grad(f)(pts)
        np.testing.assert_array_equal(np.asarray(g), 0.0)


class TestLevel:
    @pytest.mark.parametrize("step_ratio,expansion", [(2, 2), (4, 4)])
    def test_upsamples_by_step_ratio(self, rng, step_ratio, expansion):
        xyz = jnp.asarray(rng.standard_normal((2, 24, 3)).astype(np.float32))
        mod = Level(dense_n=2, growth_rate=4, knn=6, step_ratio=step_ratio)
        params = _init(mod, xyz, xyz)
        out, feats = mod.apply(params, xyz, xyz)
        assert out.shape == (2, 24 * expansion, 3)
        assert feats.shape[:2] == (2, 24)

    def test_channel_schedule_264(self, rng):
        xyz = jnp.asarray(rng.standard_normal((1, 32, 3)).astype(np.float32))
        mod = Level()  # defaults: growth 12, dense_n 3
        params = _init(mod, xyz, xyz)
        _, feats = mod.apply(params, xyz, xyz)
        assert feats.shape == (1, 32, 264)

    def test_residual_skip(self, rng):
        """With zeroed regressor output weights the output must be the
        replicated input (the residual add, upsampler.py:370-372)."""
        xyz = jnp.asarray(rng.standard_normal((1, 16, 3)).astype(np.float32))
        mod = Level(dense_n=2, growth_rate=4, knn=4)
        params = _init(mod, xyz, xyz)
        params = jax.tree.map(lambda x: x, params)  # copy
        fc2 = params["params"]["fc_layer2"]["conv"]
        fc2["kernel"] = jnp.zeros_like(fc2["kernel"])
        fc2["bias"] = jnp.zeros_like(fc2["bias"])
        out, _ = mod.apply(params, xyz, xyz)
        expect = jnp.repeat(xyz, 2, axis=1)  # point-major replication
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-6)

    def test_interlevel_skip_changes_features(self, rng):
        xyz = jnp.asarray(rng.standard_normal((2, 16, 3)).astype(np.float32))
        prev_xyz = jnp.asarray(
            rng.standard_normal((2, 8, 3)).astype(np.float32))
        mod = Level(dense_n=2, growth_rate=4, knn=4)
        params = _init(mod, xyz, xyz)
        _, f_no = mod.apply(params, xyz, xyz)
        prev_feat = jnp.asarray(rng.standard_normal(
            (2, 8, f_no.shape[-1])).astype(np.float32))
        _, f_yes = mod.apply(params, xyz, xyz, (prev_xyz, prev_feat))
        assert not np.allclose(np.asarray(f_no), np.asarray(f_yes))


class TestNet:
    def _net(self, **kw):
        cfg = dict(max_up_ratio=16, step_ratio=2, knn=4, growth_rate=4,
                   dense_n=2, max_num_point=24, fm_knn=3)
        cfg.update(kw)
        return Net(**cfg)

    def test_num_levels(self):
        assert self._net().num_levels == 4
        assert self._net(max_up_ratio=4).num_levels == 2

    @pytest.mark.parametrize("ratio", [2, 4])
    def test_train_shapes(self, rng, ratio):
        net = self._net()
        b, n = 2, 24
        xyz = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
        gt = jnp.asarray(
            rng.standard_normal((b, n * ratio, 3)).astype(np.float32))
        rngs = {"params": jax.random.PRNGKey(0),
                "patch": jax.random.PRNGKey(1)}
        params = net.init(rngs, xyz, ratio, gt, train=True)
        pred, gt_out = net.apply(params, xyz, ratio, gt, train=True,
                                 rngs={"patch": jax.random.PRNGKey(2)})
        # training keeps patch size constant via re-patching: final count
        # equals max_num_point * step_ratio once re-patching kicks in
        if ratio == 2:
            assert pred.shape == (b, n * 2, 3)
            assert gt_out.shape == (b, n * ratio, 3)
        else:
            assert pred.shape == (b, 48, 3)
            assert gt_out.shape == (b, 48, 3)

    def test_train_gt_repatch_16(self, rng):
        """At ratio 16 with 24-pt patches, levels 2..4 re-patch and the
        final pred/gt pair has max_num_point*step_ratio points."""
        net = self._net()
        b, n = 1, 24
        xyz = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
        gt = jnp.asarray(
            rng.standard_normal((b, n * 16, 3)).astype(np.float32))
        rngs = {"params": jax.random.PRNGKey(0),
                "patch": jax.random.PRNGKey(1)}
        params = net.init(rngs, xyz, 16, gt, train=True)
        pred, gt_out = net.apply(params, xyz, 16, gt, train=True,
                                 rngs={"patch": jax.random.PRNGKey(2)})
        assert pred.shape == (b, 48, 3)
        assert gt_out.shape == (b, 48, 3)

    def test_eval_no_repatch(self, rng):
        """Patch size <= max_num_point at every level -> plain cascade."""
        net = self._net(max_num_point=200)
        xyz = jnp.asarray(rng.standard_normal((3, 12, 3)).astype(np.float32))
        gt = jnp.asarray(rng.standard_normal((3, 48, 3)).astype(np.float32))
        rngs = {"params": jax.random.PRNGKey(0),
                "patch": jax.random.PRNGKey(1)}
        params = net.init(rngs, xyz, 4, gt, train=True)
        out = net.apply(params, xyz, 4, train=False)
        assert out.shape == (3, 48, 3)

    def test_eval_with_repatch(self, rng):
        """Level >1 input exceeds max_num_point -> masked sub-patch
        pipeline with FPS re-stitch."""
        net = self._net(max_num_point=24)
        xyz = jnp.asarray(rng.standard_normal((2, 24, 3)).astype(np.float32))
        gt = jnp.asarray(rng.standard_normal((2, 96, 3)).astype(np.float32))
        rngs = {"params": jax.random.PRNGKey(0),
                "patch": jax.random.PRNGKey(1)}
        params = net.init(rngs, xyz, 4, gt, train=True)
        out = net.apply(params, xyz, 4, train=False)
        assert out.shape == (2, 96, 3)

    def test_eval_jit_compiles(self, rng):
        net = self._net()
        xyz = jnp.asarray(rng.standard_normal((1, 24, 3)).astype(np.float32))
        gt = jnp.asarray(rng.standard_normal((1, 96, 3)).astype(np.float32))
        rngs = {"params": jax.random.PRNGKey(0),
                "patch": jax.random.PRNGKey(1)}
        params = net.init(rngs, xyz, 4, gt, train=True)

        @jax.jit
        def f(p, x):
            return net.apply(p, x, 4, train=False)

        out = f(params, xyz)
        assert out.shape == (1, 96, 3)


class TestAdaptiveLevel:
    def test_decodes_square_grid(self, rng):
        xyz = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
        mod = AdaptiveLevel(dense_n=2, growth_rate=4, knn=6)
        params = _init(mod, xyz, 49)
        out, gfeat = mod.apply(params, xyz, 49)
        assert out.shape == (2, 49, 3)   # round(sqrt(49))**2
        assert gfeat.shape[1] == 1       # global feature


class TestChamferLoss:
    def test_matches_oracle(self, rng):
        a = rng.standard_normal((2, 20, 3)).astype(np.float32)
        b = rng.standard_normal((2, 30, 3)).astype(np.float32)
        loss = float(chamfer_loss(jnp.asarray(a), jnp.asarray(b), chunk=8))
        cds = []
        for k in range(2):
            d1, _, d2, _ = nn_distance_oracle(a[k], b[k])
            cds.append(d1.mean() + d2.mean())
        np.testing.assert_allclose(loss, np.mean(cds), atol=1e-5)

    def test_accepts_nchw(self, rng):
        a = rng.standard_normal((1, 3, 20)).astype(np.float32)
        b = rng.standard_normal((1, 3, 25)).astype(np.float32)
        l1 = float(chamfer_loss(jnp.asarray(a), jnp.asarray(b)))
        l2 = float(chamfer_loss(jnp.asarray(a).swapaxes(1, 2),
                                jnp.asarray(b).swapaxes(1, 2)))
        np.testing.assert_allclose(l1, l2, atol=1e-6)

    def test_threshold_zeroes_outliers(self, rng):
        a = rng.uniform(-1, 1, (1, 50, 3)).astype(np.float32)
        b = a.copy()
        b[0, 0] += 100.0  # one far outlier in gt
        with_thr = float(chamfer_loss(jnp.asarray(a), jnp.asarray(b),
                                      threshold=2.0))
        without = float(chamfer_loss(jnp.asarray(a), jnp.asarray(b)))
        assert with_thr < without

    def test_stateful_wrapper(self, rng):
        a = jnp.asarray(rng.standard_normal((1, 10, 3)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((1, 12, 3)).astype(np.float32))
        crit = ChamferLoss()
        base = float(crit(a, b))
        crit.set_threshold(2.0)
        assert crit.threshold == 2.0
        crit.unset_threshold()
        np.testing.assert_allclose(float(crit(a, b)), base, atol=1e-6)

    def test_forward_weight(self, rng):
        a = jnp.asarray(rng.standard_normal((1, 10, 3)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((1, 12, 3)).astype(np.float32))
        d1, _, d2, _ = nn_distance_oracle(np.asarray(a[0]), np.asarray(b[0]))
        expect = 50.0 * d1.mean() + d2.mean()
        got = float(chamfer_loss(a, b, forward_weight=50.0))
        np.testing.assert_allclose(got, expect, atol=1e-5)


class TestFusedEdgeConv:
    def test_fused_equals_naive(self, rng):
        """The decomposed (TPU-fused) schedule computes the same function
        as the naive edge-tensor schedule with shared params."""
        x = jnp.asarray(rng.standard_normal((2, 40, 24)).astype(np.float32))
        fused = DenseEdgeConv(growth_rate=12, n=3, k=8, fused=True)
        naive = DenseEdgeConv(growth_rate=12, n=3, k=8, fused=False)
        params = fused.init({"params": jax.random.PRNGKey(0)}, x)
        yf, idxf = fused.apply(params, x)
        yn, idxn = naive.apply(params, x)  # same param tree
        np.testing.assert_array_equal(np.asarray(idxf), np.asarray(idxn))
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yn),
                                   atol=2e-5)

    def test_transposed_layout_equals_naive(self, rng, monkeypatch):
        """The transposed-chain layout (state (B, G, N*k), big axis on
        MXU lanes — see layers.FUSED_LAYOUT) computes the same function
        as both the lanes-layout fused schedule and the naive one."""
        import threepu.models.layers as lm
        x = jnp.asarray(rng.standard_normal((2, 40, 24)).astype(np.float32))
        fused = DenseEdgeConv(growth_rate=12, n=3, k=8, fused=True)
        naive = DenseEdgeConv(growth_rate=12, n=3, k=8, fused=False)
        params = fused.init({"params": jax.random.PRNGKey(0)}, x)
        monkeypatch.setattr(lm, "FUSED_LAYOUT", "lanes")
        yl, idxl = fused.apply(params, x)
        monkeypatch.setattr(lm, "FUSED_LAYOUT", "transposed")
        yt, idxt = fused.apply(params, x)
        yn, idxn = naive.apply(params, x)
        np.testing.assert_array_equal(np.asarray(idxt), np.asarray(idxn))
        np.testing.assert_allclose(np.asarray(yt), np.asarray(yl),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(yt), np.asarray(yn),
                                   atol=2e-5)
        # gradients flow through the transposed chain identically
        def loss(p, layout):
            monkeypatch.setattr(lm, "FUSED_LAYOUT", layout)
            y, _ = fused.apply(p, x)
            return jnp.sum(y ** 2)
        gl = jax.grad(loss)(params, "lanes")
        gt = jax.grad(loss)(params, "transposed")
        for a, b in zip(jax.tree_util.tree_leaves(gl),
                        jax.tree_util.tree_leaves(gt)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
