
import numpy as np
import jax
import jax.numpy as jnp
import h5py
import pytest

from threepu.data import (stage_progress, curriculum_state, load_h5_data,
                          DeviceDataset, H5Dataset, augment_batch,
                          Prefetcher)


@pytest.fixture(scope="module")
def h5_file(tmp_path_factory):
    """Synthetic multi-resolution dataset: 4 shapes on a sphere at
    resolutions 32..512 (the reference filename convention,
    data.py:63-87)."""
    path = tmp_path_factory.mktemp("data") / (
        "train_poisson_32_poisson_64_poisson_128_poisson_256_"
        "poisson_512.hdf5")
    rng = np.random.default_rng(0)
    # ONE per-shape offset shared by every resolution: all resolutions
    # of a shape must sample the SAME underlying surface (the property
    # the paired input/label patch extraction relies on)
    offset = rng.uniform(-2, 2, (4, 1, 3)).astype(np.float32)
    with h5py.File(path, "w") as f:
        for res in (32, 64, 128, 256, 512):
            pts = rng.standard_normal((4, res, 3)).astype(np.float32)
            pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
            pts += offset
            f.create_dataset(f"poisson_{res}", data=pts)
    return str(path)


class TestCurriculum:
    def test_stage_progress(self):
        # S=15000: step 0 -> stage 0 progress 0.5; step 15000 -> stage 1
        assert stage_progress(0, 15000) == (0, 0.5)
        s, p = stage_progress(15000, 15000)
        assert s == 1 and p == 0.0
        s, p = stage_progress(44999, 15000)
        assert s == 1 and p == pytest.approx(0.9999666, abs=1e-4)

    def test_state_progression(self):
        # fresh run: stage 0, scales (2,); progress is exactly 0.5,
        # which is not > 0.5, so not combined
        st = curriculum_state(0, 100, up_ratio=16)
        assert st.scales == (2,)
        assert not st.combined and st.threshold is None
        st = curriculum_state(61, 100, up_ratio=16)   # progress 0.805
        assert st.combined and st.threshold == 2.0
        st = curriculum_state(100, 100, up_ratio=16)  # stage 1 fresh
        assert st.scales == (2, 4)
        assert not st.combined
        st = curriculum_state(10_000, 100, up_ratio=16)
        assert st.scales == (2, 4, 8, 16)  # capped at num_levels

    def test_choose_ratio(self):
        st = curriculum_state(0, 100, up_ratio=16)
        rng = np.random.default_rng(0)
        assert st.choose_ratio(rng) == 2
        st = curriculum_state(10_061, 100, up_ratio=16)  # progress 0.805
        assert st.combined
        seen = {st.choose_ratio(rng) for _ in range(100)}
        assert seen == {2, 4, 8, 16}


class TestLoadH5:
    def test_resolutions_and_normalization(self, h5_file):
        data, labels, is_2d = load_h5_data(h5_file, 32, 16, 2)
        assert data.shape == (4, 32, 3)
        assert sorted(labels) == [2, 4, 8, 16]
        assert labels[16].shape == (4, 512, 3)
        assert not is_2d
        # input resolution normalized to unit radius, zero centroid
        np.testing.assert_allclose(data.mean(1), 0.0, atol=1e-5)
        radius = np.sqrt((data ** 2).sum(-1)).max(1)
        np.testing.assert_allclose(radius, 1.0, atol=1e-5)

    def test_searchsorted_picks_next_resolution(self, h5_file):
        data, labels, _ = load_h5_data(h5_file, 30, 4, 2)
        assert data.shape[1] == 32      # 30 -> next available 32
        assert labels[4].shape[1] == 128

    def test_nonconvention_filename_message(self, h5_file, tmp_path):
        """A file that doesn't follow the '<prefix>_<tag>_<n>_...'
        naming must fail with the convention spelled out, not an
        IndexError (hit in practice by a held-out split named
        'held.hdf5')."""
        import shutil

        bad = str(tmp_path / "held.hdf5")
        shutil.copy(h5_file, bad)
        with pytest.raises(ValueError, match="filename convention"):
            load_h5_data(bad, 32, 16, 2)


class TestSyntheticData:
    def test_generated_file_loads(self, tmp_path):
        """The synthetic generator's filename/dataset conventions must
        round-trip through load_h5_data — that is its whole contract
        (the reference ships no training data; this is the out-of-the-
        box path)."""
        from threepu.data.synthetic import write_synthetic_h5

        path = write_synthetic_h5(str(tmp_path), n_shapes=3, seed=11,
                                  resolutions=(64, 128, 256))
        assert path.endswith(
            "train_poisson_64_poisson_128_poisson_256.hdf5")
        data, labels, is_2d = load_h5_data(path, 64, 4, 2)
        assert data.shape == (3, 64, 3)
        assert sorted(labels) == [2, 4]
        assert labels[4].shape == (3, 256, 3)
        assert not is_2d
        # every resolution samples the SAME surface: the dense cloud
        # must lie close to the sparse one (same radial field)
        d = np.linalg.norm(data[:, :, None, :]
                           - labels[4][:, None, ::8, :], axis=-1)
        assert d.min(axis=(1, 2)).max() < 0.2

    def test_cli_entry(self, tmp_path):
        """python -m threepu.data.synthetic <dir> prints the path."""
        import io
        from contextlib import redirect_stdout
        from threepu.data.synthetic import main

        buf = io.StringIO()
        with redirect_stdout(buf):
            main([str(tmp_path), "--shapes", "2",
                  "--resolutions", "32", "64"])
        out = buf.getvalue().strip()
        assert out.endswith("train_poisson_32_poisson_64.hdf5")
        with h5py.File(out, "r") as f:
            assert f["poisson_64"].shape == (2, 64, 3)


class TestDeviceDataset:
    def test_sample_shapes(self, h5_file):
        ds = DeviceDataset(h5_file, 32, 16, batch_size=4, up_ratio=16)
        inp, lab = ds.sample(jax.random.PRNGKey(0), step=0, ratio=4)
        assert inp.shape == (4, 16, 3)
        assert lab.shape == (4, 64, 3)

    def test_label_patch_normalized(self, h5_file):
        ds = DeviceDataset(h5_file, 32, 16, batch_size=4, up_ratio=4)
        _, lab = ds.sample(jax.random.PRNGKey(1), step=1, ratio=4)
        lab = np.asarray(lab)
        radius = np.sqrt((lab ** 2).sum(-1)).max(1)
        np.testing.assert_allclose(radius, 1.0, atol=1e-4)

    def test_deterministic_given_key(self, h5_file):
        ds = DeviceDataset(h5_file, 32, 16, batch_size=2, up_ratio=4)
        a = ds.sample(jax.random.PRNGKey(7), 0, 2)
        b = ds.sample(jax.random.PRNGKey(7), 0, 2)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    def test_dropout_reduces_input(self, h5_file):
        ds = DeviceDataset(h5_file, 32, 16, batch_size=2, up_ratio=4,
                           drop_out=0.5)
        inp, lab = ds.sample(jax.random.PRNGKey(0), 0, 2)
        assert inp.shape == (2, 8, 3)
        assert lab.shape == (2, 32, 3)


class TestAugment:
    def test_rotation_preserves_pairing(self, rng):
        inp = jnp.asarray(rng.standard_normal((2, 10, 3)))
        lab = jnp.concatenate([inp, inp], axis=1)  # label contains input
        a, b = augment_batch(jax.random.PRNGKey(0), inp, lab)
        # the same rotation applied to both: input rows must still equal
        # the corresponding label rows
        np.testing.assert_allclose(np.asarray(a), np.asarray(b)[:, :10],
                                   atol=1e-5)

    def test_jitter_bounded(self, rng):
        inp = jnp.asarray(rng.standard_normal((1, 50, 3)))
        lab = jnp.asarray(rng.standard_normal((1, 100, 3)))
        a, _ = augment_batch(jax.random.PRNGKey(0), inp, lab, jitter=True,
                             jitter_sigma=0.01, jitter_max=0.02,
                             rotate=False)
        b, _ = augment_batch(jax.random.PRNGKey(0), inp, lab, jitter=False,
                             rotate=False)
        delta = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert delta > 0
        # the perturbation respects jitter_max: jitter precedes the
        # label-stat normalization and both runs share the same
        # centroid/radius, so a - b is the raw clipped noise divided by
        # the label radius
        from threepu.ops.normalize import normalize_point_batch_cl
        _, _, radius = normalize_point_batch_cl(lab)
        assert delta <= 0.02 / float(np.asarray(radius).min()) + 1e-6

    def test_2d_jitter_keeps_z(self, rng):
        inp = jnp.asarray(np.concatenate(
            [rng.standard_normal((1, 20, 2)), np.zeros((1, 20, 1))], -1))
        lab = jnp.asarray(np.concatenate(
            [rng.standard_normal((1, 40, 2)), np.zeros((1, 40, 1))], -1))
        from threepu.data.augment import jitter_points
        out = jitter_points(jax.random.PRNGKey(0), inp, 0.01, 0.05,
                            is_2d=True)
        np.testing.assert_array_equal(np.asarray(out[..., 2]),
                                      np.asarray(inp[..., 2]))


class TestH5DatasetCompat:
    def test_reference_layout_and_mutators(self, h5_file):
        ds = H5Dataset(h5_file, num_shape_point=32, num_patch_point=16,
                       batch_size=2, up_ratio=16)
        assert len(ds) == 600
        assert ds.curr_scales == [2, 4, 8, 16]
        ds.set_max_ratio(4)
        assert ds.curr_scales == [2, 4]
        ds.add_next_ratio()
        assert ds.curr_scales == [2, 4, 8]
        ds.unset_combined()
        inp, lab, ratio = ds[0]
        assert ratio == 8  # max scale when not combined
        assert inp.shape == (2, 3, 16)
        assert lab.shape == (2, 3, 16 * 8)

    def test_sync_to_step(self, h5_file):
        """Mirrors the reference train() curriculum restore
        (main.py:141-157): fresh run (step 0) -> scales [2],
        uncombined; mid-stage-2 -> [2, 4]; late progress -> combined."""
        ds = H5Dataset(h5_file, num_shape_point=32, num_patch_point=16,
                       batch_size=2, up_ratio=16)
        stage, progress = ds.sync_to_step(0, stage_steps=100)
        assert (stage, progress) == (0, 0.5)
        assert ds.curr_scales == [2]
        assert not ds._combined

        ds.sync_to_step(125, stage_steps=100)   # stage 1, progress 0.125
        assert ds.curr_scales == [2, 4]
        assert not ds._combined

        stage, progress = ds.sync_to_step(50, stage_steps=100)
        assert progress > 0.5 and ds._combined

        # up_ratio caps the stage-derived max scale
        ds.sync_to_step(10_000, stage_steps=100, up_ratio=16)
        assert ds.curr_scales == [2, 4, 8, 16]


class TestPrefetcher:
    def test_orders_and_ratios(self, h5_file):
        ds = DeviceDataset(h5_file, 32, 16, batch_size=2, up_ratio=4)
        ratios = [2, 4, 2, 4, 2]
        pf = Prefetcher(ds.sample, lambda step: ratios[step % 5],
                        jax.random.PRNGKey(0), depth=2)
        out = [next(pf) for _ in range(4)]
        assert [o[2] for o in out] == [0, 1, 2, 3]      # steps in order
        assert [o[1] for o in out] == [2, 4, 2, 4]      # ratios follow fn
        assert out[0][0][0].shape == (2, 16, 3)
