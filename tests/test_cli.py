import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threepu.cli import build_parser, result_path_for
from threepu.vis import collect_intermediates, Painter, VisdomMonitor
from threepu.models import Net


class TestFlags:
    def test_defaults_match_reference(self):
        f = build_parser().parse_args([])
        # main.py:19-77 defaults
        assert f.phase == "test"
        assert f.up_ratio == 16
        assert f.batch_size == 16
        assert f.lr_init == 0.0005
        assert f.stage_steps == 15000
        assert f.step_ratio == 2
        assert f.patch_num_ratio == 3
        assert f.jitter_sigma == 0.0025
        assert f.jitter_max == 0.005
        assert f.drop_out == 1.0
        assert f.knn == 32
        assert f.dense_n == 3
        assert f.fm_knn == 5
        assert f.growth_rate == 12
        assert f.cd_threshold == 2.0
        assert f.fidelity_weight == 50.0

    def test_result_dir_naming(self):
        # main.py:392-414: p{N}_s{N}_{clean|s####}[_d##]
        f = build_parser().parse_args(
            ["--num_point", "312", "--num_shape_point", "5000",
             "--log_dir", "./model", "--id", "demo"])
        assert result_path_for(f) == os.path.join(
            "./model", "demo", "result", "x16", "p312_s5000_clean")

    def test_result_dir_jitter_dropout(self):
        f = build_parser().parse_args(
            ["--num_shape_point", "5000", "--jitter", "--drop_out", "0.5"])
        path = result_path_for(f)
        assert "p2500" in path          # num_point = 5000 * 0.5
        assert "s00025" in path         # jitter sigma 0.0025
        assert path.endswith("_d050")

    def test_explicit_result_dir_wins(self):
        f = build_parser().parse_args(
            ["--num_point", "10", "--result_dir", "/tmp/x"])
        assert result_path_for(f) == "/tmp/x"

    def test_main_pins_platform_from_env(self, monkeypatch):
        """main() must re-assert JAX_PLATFORMS through jax.config before
        any backend init: site hooks that register accelerator plugins
        at interpreter start override env-var backend selection, so a
        ``JAX_PLATFORMS=cpu threepu ...`` invocation would otherwise
        silently initialize (or hang on) the accelerator."""
        from threepu.cli import main
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        # unset-able config state: record and restore around main()
        before = jax.config.jax_platforms
        try:
            jax.config.update("jax_platforms", None)
            with pytest.raises(SystemExit):
                main(["--phase", "bogus"])
            assert jax.config.jax_platforms == "cpu"
        finally:
            jax.config.update("jax_platforms", before)


class TestCliTestPhase:
    def test_end_to_end_tiny(self, tmp_path, rng):
        """Full CLI test phase on a tiny shape/net through a subprocess
        (the real user surface)."""
        from threepu.io import save_checkpoint
        net = Net(max_up_ratio=4, step_ratio=2, knn=4, growth_rate=4,
                  dense_n=2, max_num_point=16)
        ex = jnp.asarray(rng.standard_normal((1, 16, 3)).astype(np.float32))
        gt = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
        params = net.init({"params": jax.random.PRNGKey(0),
                           "patch": jax.random.PRNGKey(1)},
                          ex, 4, gt, train=True)["params"]
        ckpt = str(tmp_path / "tiny.npz")
        save_checkpoint(ckpt, {"params": params}, step=0)

        pts = rng.standard_normal((64, 3)).astype(np.float32)
        np.savetxt(str(tmp_path / "shape.xyz"), pts)

        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache",
                   JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.3",
                   PYTHONPATH=os.pathsep.join(
                       [os.path.dirname(os.path.dirname(__file__))]
                       + os.environ.get("PYTHONPATH", "").split(os.pathsep)))
        out = subprocess.run(
            [sys.executable, "-m", "threepu.cli", "--phase", "test",
             "--ckpt", ckpt, "--num_shape_point", "64", "--num_point", "16",
             "--up_ratio", "4", "--knn", "4", "--growth_rate", "4",
             "--dense_n", "2", "--test_data", str(tmp_path / "*.xyz"),
             "--result_dir", str(tmp_path / "out"), "--chunk", "4"],
            # generous: compiles from scratch in a subprocess and the
            # host is often shared with a TPU feed loop + xdist workers
            capture_output=True, text=True, env=env, timeout=1800)
        assert out.returncode == 0, out.stderr[-2000:]
        # outputs nest under the input's parent dir name (main.py:342-344)
        folder = os.path.basename(str(tmp_path))
        from threepu.io import read_ply
        result = read_ply(str(tmp_path / "out" / folder / "shape.ply"))
        assert result.shape == (256, 3)
        inp = read_ply(str(tmp_path / "out" / folder / "shape_input.ply"))
        assert inp.shape == (64, 3)


class TestTrainPhase:
    def test_train_end_to_end_tiny(self, tmp_path):
        """Full CLI train phase through a subprocess: generate a
        synthetic reference-format h5 (the out-of-the-box path), run
        one epoch at a tiny config, and assert the final full-state
        checkpoint lands under log_dir/id with a restorable param
        tree."""
        from threepu.data.synthetic import write_synthetic_h5

        h5 = write_synthetic_h5(str(tmp_path), n_shapes=3, seed=5,
                                resolutions=(32, 64, 128))
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache",
                   JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.3",
                   PYTHONPATH=os.pathsep.join(
                       [os.path.dirname(os.path.dirname(__file__))]
                       + os.environ.get("PYTHONPATH", "").split(
                           os.pathsep)))
        out = subprocess.run(
            [sys.executable, "-m", "threepu.cli", "--phase", "train",
             "--h5_data", h5, "--num_shape_point", "32",
             "--num_point", "12", "--up_ratio", "4", "--knn", "4",
             "--growth_rate", "4", "--dense_n", "2", "--fm_knn", "3",
             "--batch_size", "2", "--stage_steps", "100",
             "--max_epoch", "1", "--lr_init", "0.001",
             "--log_dir", str(tmp_path / "log"), "--id", "t"],
            capture_output=True, text=True, env=env, timeout=1800)
        assert out.returncode == 0, (out.stdout[-800:], out.stderr[-2000:])
        ckpt = tmp_path / "log" / "t" / "model_1.npz"
        assert ckpt.exists(), list((tmp_path / "log").rglob("*"))
        from threepu.io import load_checkpoint
        restored, step = load_checkpoint(str(ckpt))
        assert step == 600  # one epoch = 300 * batch_size steps
        leaves = jax.tree_util.tree_leaves(restored["params"])
        assert leaves and all(np.isfinite(l).all() for l in leaves)


class TestVis:
    def test_collect_intermediates(self, rng):
        net = Net(max_up_ratio=2, step_ratio=2, knn=4, growth_rate=4,
                  dense_n=2, max_num_point=32)
        xyz = jnp.asarray(rng.standard_normal((2, 16, 3)).astype(np.float32))
        gt = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
        params = net.init({"params": jax.random.PRNGKey(0),
                           "patch": jax.random.PRNGKey(1)},
                          xyz, 2, gt, train=True)["params"]
        caps = collect_intermediates(net, params, xyz, 2)
        names = [k for k in caps if "nnIdx" in k]
        assert names, caps.keys()
        idx = caps[names[0]]
        # merged to (1, B*N, k) with per-patch offsets (main.py:319-327)
        assert idx.shape[0] == 1 and idx.shape[1] == 32
        assert idx[0, 16:].min() >= 16  # second patch offset by N
        assert caps["__output__"].shape == (2, 32, 3)

    def test_painter_highlight_headless(self, rng):
        import matplotlib
        matplotlib.use("Agg")
        p = Painter("t")
        p.nnIdx = rng.integers(0, 50, (50, 4))
        xyz = rng.standard_normal((50, 3))
        fig, ax = p.interactive_3D_plot(xyz, "layer", show=False)
        assert p.highlight(ax, xyz, 3) is not None

    def test_visdom_monitor_noop_without_visdom(self):
        m = VisdomMonitor(env="test")  # visdom missing -> disabled
        m.log_train_step(1, 2, 0.5, None, (np.zeros((1, 4, 3)),
                                           np.zeros((1, 8, 3))))


class TestCompat:
    def test_pc_prediction_layout(self, rng):
        from threepu.compat import pc_prediction, get_stage_progress
        net = Net(max_up_ratio=4, step_ratio=2, knn=4, growth_rate=4,
                  dense_n=2, max_num_point=64)
        ex = jnp.asarray(rng.standard_normal((1, 16, 3)).astype(np.float32))
        gt = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
        params = net.init({"params": jax.random.PRNGKey(0),
                           "patch": jax.random.PRNGKey(1)},
                          ex, 4, gt, train=True)["params"]
        pc = jnp.asarray(
            rng.standard_normal((1, 3, 64)).astype(np.float32))
        inputs, ups = pc_prediction(net, params, pc, 4, num_point=16,
                                    chunk=4)
        assert len(inputs) == 12  # int(64/16*3)
        assert inputs[0].shape == (1, 3, 16)
        assert ups[0].shape == (1, 3, 64)
        assert get_stage_progress(0, 15000) == (0, 0.5)
