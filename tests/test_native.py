import shutil

import numpy as np
import pytest

from oracles import fps_oracle, nn_distance_oracle

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


class TestNativeFps:
    def test_matches_oracle(self, rng):
        from threepu.native import fps_cpu
        pts = rng.standard_normal((500, 3)).astype(np.float32)
        np.testing.assert_array_equal(fps_cpu(pts, 64), fps_oracle(pts, 64))

    def test_seed(self, rng):
        from threepu.native import fps_cpu
        pts = rng.standard_normal((100, 3)).astype(np.float32)
        assert fps_cpu(pts, 5, seed=42)[0] == 42

    def test_extra_columns_ignored(self, rng):
        from threepu.native import fps_cpu
        pts = rng.standard_normal((100, 6)).astype(np.float32)
        np.testing.assert_array_equal(fps_cpu(pts, 10),
                                      fps_oracle(pts[:, :3], 10))


class TestNativeNnDist:
    def test_matches_oracle(self, rng):
        from threepu.native import nn_dist2_cpu, chamfer_cpu
        a = rng.standard_normal((80, 3)).astype(np.float32)
        b = rng.standard_normal((60, 3)).astype(np.float32)
        da, ia, db, ib = nn_dist2_cpu(a, b)
        ed1, ei1, ed2, ei2 = nn_distance_oracle(a, b)
        np.testing.assert_allclose(da, ed1, rtol=1e-5)
        np.testing.assert_array_equal(ia, ei1)
        np.testing.assert_allclose(db, ed2, rtol=1e-5)
        np.testing.assert_array_equal(ib, ei2)
        np.testing.assert_allclose(chamfer_cpu(a, b),
                                   ed1.mean() + ed2.mean(), rtol=1e-5)


class TestParseXyz:
    def test_roundtrip(self, rng, tmp_path):
        from threepu.native import parse_xyz
        pts = rng.standard_normal((200, 3)).astype(np.float32)
        path = str(tmp_path / "a.xyz")
        np.savetxt(path, pts)
        back = parse_xyz(path)
        np.testing.assert_allclose(back, pts, rtol=1e-5)

    def test_downsample_points_uses_native(self, rng):
        from threepu.utils.pc_utils import downsample_points
        pts = rng.standard_normal((1000, 3)).astype(np.float32)
        out = downsample_points(pts, 100)
        assert out.shape == (100, 3)
        # native FPS output is a subset of the input
        assert all((pts == p).all(axis=1).any() for p in out[:5])
