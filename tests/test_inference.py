import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threepu.models import Net
from threepu.inference import upsample_point_cloud, upsample_shape, plan_patches
from threepu.parallel import (make_mesh, make_sharded_upsampler,
                              make_sharded_train_step)
from threepu.train.model import create_train_state, make_optimizer, train_step


def _tiny_net():
    return Net(max_up_ratio=4, step_ratio=2, knn=4, growth_rate=4,
               dense_n=2, max_num_point=64, fm_knn=3)


@pytest.fixture(scope="module")
def net_and_params():
    net = _tiny_net()
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((1, 16, 3)).astype(np.float32))
    gt = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
    params = net.init({"params": jax.random.PRNGKey(0),
                       "patch": jax.random.PRNGKey(1)},
                      xyz, 4, gt, train=True)["params"]
    return net, params


@pytest.fixture(scope="module")
def shape():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((128, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)  # unit sphere
    return pts


class TestPlanPatches:
    def test_reference_count(self):
        # main.py:225 -> int(5000 / 312 * 3) = 48
        n, padded, chunk = plan_patches(5000, 312, 3.0, 8)
        assert n == 48 and padded == 48 and chunk == 8

    def test_padding(self):
        n, padded, chunk = plan_patches(5000, 312, 3.0, 10)
        assert n == 48 and padded == 50 and chunk == 10

    def test_num_patches_override_roundtrip(self):
        # make_sharded_upsampler honors num_patches by solving for the
        # equivalent patch_num_ratio; the floor in plan_patches must
        # recover the requested count exactly
        for n_shape, num_point, req in [(5000, 312, 96), (128, 16, 24),
                                        (128, 16, 12), (120, 16, 9),
                                        (5000, 312, 48)]:
            pnr = req * num_point / n_shape + 1e-9
            got, _, _ = plan_patches(n_shape, num_point, pnr)
            assert got == req, (n_shape, num_point, req, got)


class TestUpsamplePointCloud:
    def test_output_shape_and_frame(self, net_and_params, shape):
        net, params = net_and_params
        out = upsample_point_cloud(net, params, jnp.asarray(shape), 4,
                                   num_point=16, num_out=512, chunk=4)
        out = np.asarray(out)
        assert out.shape == (512, 3)
        # stays near the unit sphere (residual net on normalized patches)
        r = np.linalg.norm(out, axis=-1)
        assert r.max() < 3.0 and np.isfinite(out).all()

    def test_chunking_invariant(self, net_and_params, shape):
        """Chunk size must not change the result (pure reshaping)."""
        net, params = net_and_params
        a = upsample_point_cloud(net, params, jnp.asarray(shape), 2,
                                 num_point=16, num_out=256, chunk=4)
        b = upsample_point_cloud(net, params, jnp.asarray(shape), 2,
                                 num_point=16, num_out=256, chunk=12)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_host_wrapper(self, net_and_params, shape):
        net, params = net_and_params
        inp, up = upsample_shape(net, params, shape * 5 + 2, 2,
                                 num_point=16, chunk=4)
        assert up.shape == (256, 3)
        # output in the ORIGINAL frame (denormalized)
        assert np.abs(up.mean(0) - 2).max() < 2.0

    def test_dropout_path(self, net_and_params, shape):
        net, params = net_and_params
        inp, up = upsample_shape(net, params, shape, 2, num_point=16,
                                 chunk=4, drop_out=0.5)
        assert inp.shape == (64, 3)
        assert up.shape == (128, 3)

    def test_bucketed_matches_exact(self, net_and_params, shape):
        """Bucketing (pad to a static size + masks) must reproduce the
        exact-size pipeline bit for bit on CPU: FPS selection is
        prefix-consistent and masked points are unselectable.  (On TPU
        the bucketed and exact programs are distinct XLA compilations
        whose fusion/FMA rounding can flip selection near-ties; there
        the guarantee is set-level — benchmarks/tpu_checks.py asserts
        the Chamfer bound on hardware.)"""
        net, params = net_and_params
        for n_real in (100, 128):
            pts = shape[:n_real]
            exact_in, exact_up = upsample_shape(
                net, params, pts, 2, num_point=16, chunk=4)
            buck_in, buck_up = upsample_shape(
                net, params, pts, 2, num_point=16, chunk=4, bucket=64)
            assert buck_up.shape == exact_up.shape
            np.testing.assert_allclose(buck_up, exact_up, atol=1e-5)

    def test_bucketed_shares_one_compile(self, net_and_params, shape):
        """Two sizes in one bucket must hit the same compiled program
        (the whole point: no ~minute recompile per distinct size)."""
        net, params = net_and_params
        upsample_shape(net, params, shape[:100], 2, num_point=16,
                       chunk=4, bucket=64)
        before = upsample_point_cloud._cache_size()
        upsample_shape(net, params, shape[:90], 2, num_point=16,
                       chunk=4, bucket=64)
        assert upsample_point_cloud._cache_size() == before

    def test_hierarchical_restitch(self, net_and_params, shape):
        """restitch_groups>1 swaps the final merge FPS for the
        Morton-stratified grouped variant: the output must be a valid
        point SET (every row an actual merged-cloud point, no
        duplicates beyond the merge's own) that stays close to the
        exact-restitch output — only the final selection differs, the
        cascade is shared."""
        net, params = net_and_params
        exact = np.asarray(upsample_point_cloud(
            net, params, jnp.asarray(shape), 2, num_point=16,
            num_out=256, chunk=4))
        hier = np.asarray(upsample_point_cloud(
            net, params, jnp.asarray(shape), 2, num_point=16,
            num_out=256, chunk=4, restitch_groups=2))
        assert hier.shape == exact.shape
        assert np.isfinite(hier).all()
        # both select from the same merged cloud: every hierarchical
        # pick must match SOME exact-cloud point's neighborhood scale
        d = np.linalg.norm(hier[:, None, :] - exact[None], axis=-1)
        nn = d.min(axis=1)
        spacing = np.sort(np.linalg.norm(
            exact[:, None] - exact[None], axis=-1), axis=1)[:, 1].mean()
        assert nn.mean() < 2.0 * spacing

    def test_restitch_default_resolution(self, net_and_params, shape):
        """The unset (None) default resolves size-gated: reference-exact
        below RESTITCH_AUTO_MIN_OUT (small shapes keep bit-parity with
        the reference's final FPS), G=8 hierarchical above (settled at
        trained weights, benchmarks/restitch_quality.py)."""
        from threepu.inference import (DEFAULT_RESTITCH_GROUPS,
                                       RESTITCH_AUTO_MIN_OUT,
                                       resolve_restitch_groups)
        assert resolve_restitch_groups(None, RESTITCH_AUTO_MIN_OUT) == \
            DEFAULT_RESTITCH_GROUPS
        assert resolve_restitch_groups(None,
                                       RESTITCH_AUTO_MIN_OUT - 1) == 1
        assert resolve_restitch_groups(1, 10 ** 6) == 1   # explicit wins
        assert resolve_restitch_groups(4, 16) == 4
        # below the gate the unset default is bit-identical to exact
        net, params = net_and_params
        auto = np.asarray(upsample_point_cloud(
            net, params, jnp.asarray(shape), 2, num_point=16,
            num_out=256, chunk=4))
        exact = np.asarray(upsample_point_cloud(
            net, params, jnp.asarray(shape), 2, num_point=16,
            num_out=256, chunk=4, restitch_groups=1))
        np.testing.assert_array_equal(auto, exact)


class TestShardedInference:
    def test_matches_single_device(self, net_and_params, shape):
        net, params = net_and_params
        mesh = make_mesh(8)
        single = upsample_point_cloud(net, params, jnp.asarray(shape), 2,
                                      num_point=16, num_out=256, chunk=24)
        num_patches = plan_patches(128, 16, 3.0)[0]
        sharded_fn = make_sharded_upsampler(net, mesh, 2, 16, num_patches,
                                            256)
        sharded = sharded_fn(params, jnp.asarray(shape))
        np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                                   atol=1e-4)

    def test_sharded_repatch_cascade(self, net_and_params, shape):
        """The outlier-masked sub-patch/merge path (ratio 4 at patch
        size == max_num_point) runs INSIDE shard_map — the sharded
        pipeline is the serial pipeline, not a fork of it."""
        net, params = net_and_params
        mesh = make_mesh(8)
        single = upsample_point_cloud(net, params, jnp.asarray(shape), 4,
                                      num_point=64, num_out=512)
        fn = make_sharded_upsampler(net, mesh, 4, 64, num_out=512)
        np.testing.assert_allclose(
            np.asarray(single), np.asarray(fn(params, jnp.asarray(shape))),
            atol=1e-4)

    def test_sharded_bucketed(self, net_and_params, shape):
        """Bucketing (valid_n / valid_patches masking) through the
        sharded pipeline matches the serial bucketed result."""
        from threepu.inference import upsample_shape
        net, params = net_and_params
        mesh = make_mesh(8)
        pts = shape[:100]
        _, serial = upsample_shape(net, params, pts, 2, num_point=16,
                                   chunk=4, bucket=64)
        _, sharded = upsample_shape(net, params, pts, 2, num_point=16,
                                    chunk=4, bucket=64, mesh=mesh)
        np.testing.assert_allclose(serial, sharded, atol=1e-4)


class TestShardedTrain:
    def test_matches_single_device(self):
        rng = np.random.default_rng(0)
        inp = jnp.asarray(rng.standard_normal((8, 16, 3)).astype(np.float32))
        gt = jnp.asarray(rng.standard_normal((8, 64, 3)).astype(np.float32))
        net = _tiny_net()
        tx = make_optimizer(1e-3)
        state_a = create_train_state(net, jax.random.PRNGKey(0), inp, gt,
                                     4, tx=tx)
        state_b = jax.tree.map(lambda x: x.copy(), state_a)

        key = jax.random.PRNGKey(5)
        state_a, cd_a = train_step(net, tx, state_a, key, inp, gt, 4)

        mesh = make_mesh(8)
        sharded = make_sharded_train_step(net, tx, mesh)
        state_b, cd_b = sharded(net, tx, state_b, key, inp, gt, 4)

        np.testing.assert_allclose(float(cd_a), float(cd_b), atol=1e-5)
        for a, b in zip(jax.tree.leaves(state_a.params),
                        jax.tree.leaves(state_b.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
