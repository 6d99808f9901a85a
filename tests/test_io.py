import numpy as np
import jax
import jax.numpy as jnp

from threepu.io import (read_ply, read_ply_with_color, save_ply,
                        save_ply_property, save_ply_with_face, load, save,
                        save_checkpoint, load_checkpoint, import_pth,
                        export_reference_state)
from threepu.models import Net


class TestPly:
    def test_roundtrip_points(self, rng, tmp_path):
        pts = rng.standard_normal((100, 3)).astype(np.float32)
        path = str(tmp_path / "a.ply")
        save_ply(pts, path)
        back = read_ply(path)
        np.testing.assert_allclose(back, pts, atol=1e-6)

    def test_roundtrip_normals_colors(self, rng, tmp_path):
        pts = rng.standard_normal((50, 3)).astype(np.float32)
        nrm = rng.standard_normal((50, 3)).astype(np.float32)
        col = rng.uniform(0, 1, (50, 3))
        path = str(tmp_path / "b.ply")
        save_ply(pts, path, colors=col, normals=nrm)
        back = read_ply(path)
        assert back.shape == (50, 6)  # xyz + normals
        np.testing.assert_allclose(back[:, 3:], nrm, atol=1e-6)
        pts2, colors = read_ply_with_color(path)
        np.testing.assert_allclose(colors, np.round(col * 255) / 255.0,
                                   atol=1 / 255.0)

    def test_read_with_count_pads_and_downsamples(self, rng, tmp_path):
        pts = rng.standard_normal((40, 3)).astype(np.float32)
        path = str(tmp_path / "c.ply")
        save_ply(pts, path)
        assert read_ply(path, 60).shape == (60, 3)
        assert read_ply(path, 10).shape == (10, 3)

    def test_faces(self, rng, tmp_path):
        pts = rng.standard_normal((4, 3)).astype(np.float32)
        faces = np.array([[0, 1, 2], [1, 2, 3]])
        path = str(tmp_path / "d.ply")
        save_ply_with_face(pts, faces, path, colors=np.ones((2, 3)) * 0.5)
        from threepu.io.ply import read_ply_data
        data = read_ply_data(path)
        np.testing.assert_array_equal(data["face"]["vertex_indices"], faces)

    def test_property_colormap(self, rng, tmp_path):
        pts = rng.standard_normal((10, 3)).astype(np.float32)
        path = str(tmp_path / "e.ply")
        save_ply_property(pts, np.arange(10), path)
        _, colors = read_ply_with_color(path)
        assert colors.shape == (10, 3)


class TestLoadDispatch:
    def test_xyz_text(self, rng, tmp_path):
        pts = rng.standard_normal((30, 3)).astype(np.float32)
        path = str(tmp_path / "a.xyz")
        np.savetxt(path, pts)
        back = load(path)
        np.testing.assert_allclose(back, pts, atol=1e-5)
        assert load(path, 50).shape == (50, 3)
        assert load(path, 12).shape == (12, 3)

    def test_ply_dispatch(self, rng, tmp_path):
        pts = rng.standard_normal((30, 3)).astype(np.float32)
        path = str(tmp_path / "a.ply")
        save(pts, path)
        np.testing.assert_allclose(load(path), pts, atol=1e-6)


def _tiny_net_params():
    net = Net(max_up_ratio=4, step_ratio=2, knn=4, growth_rate=4,
              dense_n=2, max_num_point=16)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((1, 16, 3)).astype(np.float32))
    gt = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "patch": jax.random.PRNGKey(1)}
    return net, net.init(rngs, xyz, 4, gt, train=True)


class TestCheckpoint:
    def test_native_roundtrip(self, tmp_path):
        net, params = _tiny_net_params()
        path = str(tmp_path / "ckpt.npz")
        save_checkpoint(path, params, step=1234)
        restored, step = load_checkpoint(path)
        assert step == 1234
        flat_a = jax.tree_util.tree_leaves(params)
        flat_b = jax.tree_util.tree_leaves(restored)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_partial_restore_drops_unknown(self, tmp_path):
        net, params = _tiny_net_params()
        path = str(tmp_path / "ckpt.npz")

        # (a) checkpoint contains a key absent from the target: it must
        # be ignored, not crash or mis-merge (restoring a full ckpt
        # into a smaller net, pytorch_utils.py:32-39)
        bigger = jax.tree.map(lambda x: x, params)
        bigger["params"]["extra_head"] = {"kernel": jnp.ones((2, 2))}
        save_checkpoint(path, bigger, step=7)
        restored, step = load_checkpoint(path, params)
        assert "extra_head" not in restored["params"]
        assert step == 7

        # (b) target has a leaf the checkpoint lacks: it keeps its value
        save_checkpoint(path, params, step=7)
        target = jax.tree.map(lambda x: x, params)
        target["params"]["extra_head"] = {"kernel": jnp.zeros((2, 2))}
        restored, step = load_checkpoint(path, target)
        assert "extra_head" in restored["params"]
        assert step == 7

    def test_pth_import_roundtrip(self, tmp_path):
        """export_reference_state -> torch.save -> import_pth recovers
        the exact param tree (the parity bridge for final_poisson.pth)."""
        import torch
        net, params = _tiny_net_params()
        state = export_reference_state(params, step=42)
        state["states"] = {k: torch.from_numpy(np.asarray(v))
                           for k, v in state["states"].items()}
        path = str(tmp_path / "ref.pth")
        torch.save(state, path)
        restored, step = import_pth(path, params)
        assert step == 42
        la = jax.tree_util.tree_leaves(params)
        lb = jax.tree_util.tree_leaves(restored)
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pth_import_reference_names(self, tmp_path):
        """Import from a hand-built state dict using the reference's
        exact module names (network/upsampler.py:209-230)."""
        import torch
        rng = np.random.default_rng(0)
        state = {}
        # level_1 of a tiny net: dense_n=2, growth=4, knn=4
        shapes2d = {
            "levels.level_1.layer0.conv": (24, 3),
            "levels.level_1.up_layer.up_layer1.conv": (128, 61 + 1),
            "levels.level_1.up_layer.up_layer2.conv": (128, 128),
            "levels.level_1.fc_layer1.conv": (64, 128),
            "levels.level_1.fc_layer2.conv": (3, 64),
            "levels.level_1.layer1.mlps.0": (4, 48),
            "levels.level_1.layer1.mlps.1": (4, 28),
        }
        for name, (out_c, in_c) in shapes2d.items():
            state[name + ".weight"] = torch.from_numpy(
                rng.standard_normal((out_c, in_c, 1, 1)).astype(np.float32))
            state[name + ".bias"] = torch.from_numpy(
                rng.standard_normal((out_c,)).astype(np.float32))
        path = str(tmp_path / "ref2.pth")
        torch.save({"states": state, "step": "99"}, path)
        restored, step = import_pth(path)
        assert step == 99
        p = restored["params"]["level_1"]
        assert p["layer0"]["conv"]["kernel"].shape == (3, 24)
        assert p["layer1"]["mlps_0"]["kernel"].shape == (48, 4)
        assert p["up_layer1"]["conv"]["kernel"].shape == (62, 128)
        # value check: kernel is the transposed squeezed conv weight
        w = state["levels.level_1.layer0.conv.weight"].numpy()[..., 0, 0]
        np.testing.assert_array_equal(p["layer0"]["conv"]["kernel"], w.T)

    def test_dataparallel_prefix_unwrapped(self, tmp_path):
        import torch
        w = np.ones((5, 7, 1, 1), np.float32)
        state = {"module.levels.level_1.layer0.conv.weight":
                 torch.from_numpy(w)}
        path = str(tmp_path / "dp.pth")
        torch.save({"states": state}, path)
        restored, _ = import_pth(path)
        assert restored["params"]["level_1"]["layer0"]["conv"][
            "kernel"].shape == (7, 5)
