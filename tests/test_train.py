
import numpy as np
import h5py
import jax
import jax.numpy as jnp
import pytest

from threepu.models import Net
from threepu.train import (create_train_state, train_step, loss_weight,
                           Model, train_loop, TrainConfig)
from threepu.train.model import make_optimizer


def _tiny_net():
    return Net(max_up_ratio=4, step_ratio=2, knn=4, growth_rate=4,
               dense_n=2, max_num_point=16, fm_knn=3)


@pytest.fixture(scope="module")
def tiny_batch():
    rng = np.random.default_rng(0)
    sphere = rng.standard_normal((2, 16, 3)).astype(np.float32)
    sphere /= np.linalg.norm(sphere, axis=-1, keepdims=True)
    gt = rng.standard_normal((2, 64, 3)).astype(np.float32)
    gt /= np.linalg.norm(gt, axis=-1, keepdims=True)
    return jnp.asarray(sphere), jnp.asarray(gt)


class TestLossWeight:
    def test_reference_formula(self):
        # model.py:72 — zero at max ratio (the latent bug)
        assert loss_weight(16, 16, 2, "reference") == 0.0
        assert loss_weight(2, 16, 2, "reference") == 3.0

    def test_floored_default(self):
        assert loss_weight(16, 16, 2, "floored") == 1.0
        assert loss_weight(8, 16, 2, "floored") == 1.0
        assert loss_weight(4, 16, 2, "floored") == 2.0
        assert loss_weight(2, 16, 2, "floored") == 3.0


class TestTrainStep:
    def test_loss_decreases(self, tiny_batch):
        inp, gt = tiny_batch
        net = _tiny_net()
        tx = make_optimizer(1e-3)
        state = create_train_state(net, jax.random.PRNGKey(0), inp, gt, 4,
                                   tx=tx)
        key = jax.random.PRNGKey(1)
        losses = []
        for i in range(12):
            key, sub = jax.random.split(key)
            state, cd = train_step(net, tx, state, sub, inp, gt, 4)
            losses.append(float(cd))
        assert int(state.step) == 12
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()

    def test_pallas_select_path_matches(self, tiny_batch):
        """train_step must trace AND produce bit-identical losses and
        parameter updates when exact selection routes through the
        Pallas kernel (the round-4 TPU default, backend-gated so the
        CPU suite never sees it naturally).  Interpret mode stands in
        for the chip; the k/backend gates are bypassed on purpose so
        every selection site — including the big-k re-patch the real
        dispatch excludes — proves AD-safe through the kernel's custom
        VJP (gradients flow through the fm-distance selection)."""
        from threepu.ops import knn as knn_mod
        from threepu.ops.select_pallas import select_pallas

        inp, gt = tiny_batch
        net = _tiny_net()
        tx = make_optimizer(1e-3)

        def run():
            state = create_train_state(net, jax.random.PRNGKey(0), inp,
                                       gt, 4, tx=tx)
            losses = []
            for i in range(3):
                state, cd = train_step(net, tx, state,
                                       jax.random.PRNGKey(10 + i),
                                       inp, gt, 4)
                losses.append(float(cd))
            return losses, state

        base_losses, base_state = run()
        orig = knn_mod._exact_select
        knn_mod._exact_select = lambda d, k: (
            select_pallas(d, k, interpret=True) if d.ndim >= 2
            else orig(d, k))
        try:
            jax.clear_caches()
            k_losses, k_state = run()
        finally:
            knn_mod._exact_select = orig
            jax.clear_caches()
        # bit-equality of losses holds today under CPU interpret mode
        # (both programs run the same scalar math); it is NOT a
        # hardware guarantee — the on-chip A/B of the analogous pair
        # saw 1-ulp gradient differences (select_train_bench.py).
        assert base_losses == k_losses
        # params: a few-f32-ulp band rather than bit-equality — the two
        # runs are different HLO programs (top_k VJP vs the kernel's
        # scatter VJP) and XLA fusion/ordering may legitimately round
        # differently under future versions even though today they
        # agree exactly.
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(base_state.params),
                jax.tree_util.tree_leaves_with_path(k_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-7, atol=1e-8,
                                       err_msg=str(pa))

    def test_threshold_variant_compiles(self, tiny_batch):
        inp, gt = tiny_batch
        net = _tiny_net()
        tx = make_optimizer(1e-3)
        state = create_train_state(net, jax.random.PRNGKey(0), inp, gt, 2,
                                   tx=tx)
        state, cd = train_step(net, tx, state, jax.random.PRNGKey(1),
                               inp, gt, 2, threshold=2.0)
        assert np.isfinite(float(cd))

    def test_grad_clipping_present(self, tiny_batch):
        """optax.clip(1.0) mirrors clip_grad_value_(params, 1)
        (model.py:64).  Verified through the REAL make_optimizer chain:
        a gradient of 100 must produce exactly the same update as the
        same gradient pre-clipped to 1 — true only if the clip stage is
        actually in the chain."""
        tx = make_optimizer(5e-4)
        params = {"w": jnp.asarray([0.0, 0.0, 0.0])}
        g_big = {"w": jnp.asarray([100.0, -50.0, 0.5])}
        g_clipped = {"w": jnp.asarray([1.0, -1.0, 0.5])}
        up_big, _ = tx.update(g_big, tx.init(params), params)
        up_clip, _ = tx.update(g_clipped, tx.init(params), params)
        np.testing.assert_allclose(np.asarray(up_big["w"]),
                                   np.asarray(up_clip["w"]))
        # and the clip is not a no-op: an unclipped gradient of 2 gives
        # a different update than a gradient of 1 would
        up_two, _ = tx.update({"w": jnp.asarray([2.0, 0.0, 0.0])},
                              tx.init(params), params)
        up_one, _ = tx.update({"w": jnp.asarray([1.0, 0.0, 0.0])},
                              tx.init(params), params)
        np.testing.assert_allclose(np.asarray(up_two["w"]),
                                   np.asarray(up_one["w"]))


class TestModelCompat:
    def test_optimize_and_error_log(self, tiny_batch):
        inp, gt = tiny_batch
        net = _tiny_net()
        model = Model(net, "train", lr_init=1e-3)
        # reference layout input (B, 3, N)
        model.set_input(jnp.swapaxes(inp, 1, 2), 4,
                        jnp.swapaxes(gt, 1, 2))
        l1 = model.optimize()
        l2 = model.optimize()
        assert model.step == 2
        assert "cd_loss_x4" in model.error_log
        assert np.isfinite([l1, l2]).all()

    def test_forward_eval(self, tiny_batch):
        inp, gt = tiny_batch
        net = _tiny_net()
        model = Model(net, "train", lr_init=1e-3)
        model.set_input(inp, 4, gt)
        model.optimize()
        out = model.forward()
        assert out.shape == (2, 64, 3)


@pytest.fixture(scope="module")
def h5_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / (
        "train_poisson_32_poisson_64_poisson_128.hdf5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        for res in (32, 64, 128):
            pts = rng.standard_normal((3, res, 3)).astype(np.float32)
            pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
            f.create_dataset(f"poisson_{res}", data=pts)
    return str(path)


class TestTrainLoop:
    def test_smoke_with_checkpoint(self, h5_file, tmp_path):
        cfg = TrainConfig(
            h5_data=h5_file, num_shape_point=32, num_point=12,
            batch_size=2, up_ratio=4, step_ratio=2, knn=4, growth_rate=4,
            dense_n=2, max_num_point=12, stage_steps=4, max_epoch=1,
            model_dir=str(tmp_path), lr_init=1e-3, ckpt_epochs=1)
        state, error_log = train_loop(cfg, max_steps=10)
        assert int(state.step) == 10
        assert any(k.startswith("cd_loss") for k in error_log)

    def test_log_fn_receives_pred_and_running_mean(self, h5_file,
                                                   tmp_path):
        """Log steps must expose the training prediction and the
        running-mean error (visdom parity, ``main.py:184-201``)."""
        calls = []

        def log_fn(step, ratio, loss, state, batch, pred=None,
                   gt_out=None, error=None):
            calls.append((step, ratio, pred, gt_out, error))

        cfg = TrainConfig(
            h5_data=h5_file, num_shape_point=32, num_point=12,
            batch_size=2, up_ratio=4, step_ratio=2, knn=4, growth_rate=4,
            dense_n=2, max_num_point=12, stage_steps=100, max_epoch=1,
            model_dir=str(tmp_path), lr_init=1e-3, log_steps=2)
        train_loop(cfg, max_steps=4, log_fn=log_fn)
        assert [c[0] for c in calls] == [2, 4]
        for step, ratio, pred, gt_out, error in calls:
            assert pred is not None and pred.ndim == 3
            assert pred.shape[-1] == 3
            assert gt_out is not None and gt_out.ndim == 3
            assert error is not None and np.isfinite(error)

    def test_loop_under_mesh_matches_serial(self, h5_file, tmp_path):
        """``train_loop`` with ``cfg.mesh`` (the multi-chip DP path)
        must produce the same parameters and error log as the serial
        loop — same batches (step-keyed prefetch), the XLA all-reduce
        over the replicated-params/sharded-batch step is numerically
        the single-device step (TestShardedTrainStep), and the deferred
        loss flush handles sharded device scalars."""
        from threepu.parallel import make_mesh

        base = dict(
            h5_data=h5_file, num_shape_point=32, num_point=12,
            batch_size=2, up_ratio=4, step_ratio=2, knn=4, growth_rate=4,
            dense_n=2, max_num_point=12, stage_steps=4, max_epoch=1,
            model_dir=str(tmp_path), lr_init=1e-3, ckpt_epochs=100)
        serial, log_s = train_loop(TrainConfig(**base), max_steps=6)
        sharded, log_m = train_loop(
            TrainConfig(**base, mesh=make_mesh(2)), max_steps=6)
        assert log_s.keys() == log_m.keys()
        for k in log_s:
            assert np.isclose(log_s[k], log_m[k], rtol=1e-5), (
                k, log_s[k], log_m[k])
        for a, b in zip(jax.tree_util.tree_leaves(serial.params),
                        jax.tree_util.tree_leaves(sharded.params)):
            # all-reduce vs single-device summation order drifts a few
            # ulp per step; 6 Adam steps compound it to ~1e-5
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_deferred_loss_fetch_identical_error_log(self, h5_file,
                                                     tmp_path):
        """The running-mean error log batches its device->host loss
        fetches every ``log_steps`` (a per-step fetch through the TPU
        tunnel halves training throughput); replaying the buffered
        updates in order must be bit-identical to fetching every step
        (``log_steps=1``) at every flush boundary case: mid-cadence
        stop (7 steps, cadence 5) and exact-cadence stop (10 of 5)."""
        logs = {}
        for cadence, steps in ((1, 7), (5, 7), (1, 10), (5, 10)):
            cfg = TrainConfig(
                h5_data=h5_file, num_shape_point=32, num_point=12,
                batch_size=2, up_ratio=4, step_ratio=2, knn=4,
                growth_rate=4, dense_n=2, max_num_point=12,
                stage_steps=4, max_epoch=1, model_dir=str(tmp_path),
                lr_init=1e-3, ckpt_epochs=100, log_steps=cadence)
            _, error_log = train_loop(cfg, max_steps=steps)
            logs[(cadence, steps)] = dict(error_log)
        for steps in (7, 10):
            a, b = logs[(1, steps)], logs[(5, steps)]
            assert a.keys() == b.keys()
            for k in a:
                assert a[k] == b[k], (steps, k, a[k], b[k])

    def test_pth_checkpoint_format(self, h5_file, tmp_path):
        """ckpt_format='pth' writes reference-named, reference-loadable
        files ({label}_{epoch}.pth)."""
        pytest.importorskip("torch")
        from threepu.train.loop import save_epoch_checkpoint
        from threepu.io import import_pth

        cfg = TrainConfig(
            h5_data=h5_file, num_shape_point=32, num_point=12,
            batch_size=2, up_ratio=4, step_ratio=2, knn=4, growth_rate=4,
            dense_n=2, max_num_point=12, stage_steps=4, max_epoch=1,
            model_dir=str(tmp_path / "pth"), lr_init=1e-3,
            ckpt_format="pth")
        state, _ = train_loop(cfg, max_steps=2)
        path = save_epoch_checkpoint(cfg, state, int(state.step), 7)
        assert path.endswith("model_7.pth")
        restored, step = import_pth(path)
        assert step == 2
        flat = jax.tree_util.tree_leaves(restored["params"])
        assert flat and all(np.all(np.isfinite(x)) for x in flat)

    def test_resume_from_checkpoint(self, h5_file, tmp_path):
        from threepu.io import save_checkpoint
        cfg = TrainConfig(
            h5_data=h5_file, num_shape_point=32, num_point=12,
            batch_size=2, up_ratio=4, step_ratio=2, knn=4, growth_rate=4,
            dense_n=2, max_num_point=12, stage_steps=4, max_epoch=100,
            model_dir=str(tmp_path), lr_init=1e-3)
        state, _ = train_loop(cfg, max_steps=3)
        path = str(tmp_path / "resume.npz")
        save_checkpoint(path, {"params": jax.device_get(state.params)},
                        step=int(state.step))
        cfg.ckpt = path
        state2, _ = train_loop(cfg, max_steps=5)
        assert int(state2.step) == 5

    def test_exact_resume_matches_uninterrupted(self, h5_file, tmp_path):
        """Full-state resume (params + Adam moments + step-keyed RNG)
        must continue bit-for-bit: interrupt-at-3-resume-to-6 equals an
        uninterrupted 6-step run.  (The reference persists only
        {params, step}; its resumes silently reset the moments.)"""
        import dataclasses
        from threepu.io import save_train_checkpoint
        cfg = TrainConfig(
            h5_data=h5_file, num_shape_point=32, num_point=12,
            batch_size=2, up_ratio=4, step_ratio=2, knn=4, growth_rate=4,
            dense_n=2, max_num_point=12, stage_steps=4, max_epoch=100,
            model_dir=str(tmp_path), lr_init=1e-3)
        straight, _ = train_loop(cfg, max_steps=6)

        half, _ = train_loop(dataclasses.replace(cfg), max_steps=3)
        path = str(tmp_path / "full.npz")
        save_train_checkpoint(
            path, {"params": jax.device_get(half.params)},
            jax.device_get(half.opt_state), step=int(half.step))
        resumed, _ = train_loop(
            dataclasses.replace(cfg, ckpt=path), max_steps=6)

        assert int(resumed.step) == 6
        a = jax.tree_util.tree_leaves(straight.params)
        b = jax.tree_util.tree_leaves(resumed.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
