"""Multi-resolution HDF5 curriculum dataset.

Reference equivalent: ``data.py`` (component P5 in SURVEY.md).  Two
layers:

- :func:`load_h5_data` — host-side load + normalization, mirroring the
  reference exactly: resolutions parsed from the filename, input
  resolution by ``searchsorted``, every resolution normalized by the
  *input* resolution's centroid/radius (``data.py:63-117``), 2D
  detection.
- :class:`DeviceDataset` — the TPU-first pipeline: the whole dataset
  lives in HBM and patch sampling + augmentation compile into one XLA
  program per ratio (the reference does this per batch on CPU worker
  processes).  Ratio/shape selection stays host-side (static shapes).

:class:`H5Dataset` is a compatibility wrapper with the reference's
class API (curriculum mutators ``add_next_ratio``/``set_combined``/
``unset_combined``/``set_max_ratio``, ``data.py:49-61``; 300 batches
per epoch, ``data.py:46-47``).
"""

from __future__ import annotations

import math
import os
import re
from functools import partial
from typing import Dict, Tuple

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from threepu.data.augment import augment_batch
from threepu.ops import knn_group
from threepu.utils import logger

Array = jax.Array


def load_h5_data(h5_path: str, num_shape_point: int, up_ratio: int = 16,
                 step_ratio: int = 2
                 ) -> Tuple[np.ndarray, Dict[int, np.ndarray], bool]:
    """Returns (input (S, N, 3) normalized, {ratio: (S, rN, 3)}, is_2D)."""
    basename = os.path.basename(h5_path)
    resolutions = sorted(int(x) for x in re.findall(r"\d+", basename[:-5]))
    resolutions = np.asarray(resolutions)
    tags = re.findall(r"_([A-Za-z]+)_", basename)
    if not tags or resolutions.size == 0:
        # fail with the convention spelled out instead of an IndexError
        # (the reference shares this convention: main.py reads dataset
        # names like {tag}_{n} keyed by the training-file name)
        raise ValueError(
            f"{basename!r} does not follow the training-data filename "
            "convention '<prefix>_<tag>_<n1>_<tag>_<n2>_....hdf5' "
            "(e.g. 'train_poisson_310_poisson_625_..._poisson_80000"
            ".hdf5'); the dataset keys '<tag>_<n>' are derived from it")
    tag = tags[-1]
    num_in = int(resolutions[np.searchsorted(resolutions, num_shape_point)])

    with h5py.File(h5_path, "r") as f:
        data = f[f"{tag}_{num_in}"][:, :, 0:3].astype(np.float32)
        logger.info(f"input point_num {data.shape[1]}")
        centroid = np.mean(data, axis=1, keepdims=True)
        data = data - centroid
        furthest = np.amax(np.sqrt(np.sum(data ** 2, axis=-1)),
                           axis=1, keepdims=True)[..., None]
        data = data / furthest

        labels: Dict[int, np.ndarray] = {}
        num_levels = int(math.log(up_ratio, step_ratio))
        for x in range(1, num_levels + 1):
            r = step_ratio ** x
            res = int(resolutions[np.searchsorted(resolutions, num_in * r)])
            arr = f[f"{tag}_{res}"][:, :, 0:3].astype(np.float32)
            labels[r] = (arr - centroid) / furthest
            logger.info(f"gt (ratio {r}), point_num {arr.shape[1]}")

    is_2d = bool(np.all(data[:, :, 2] == 0))
    if is_2d:
        logger.info("2D dataset")
    logger.info(f"total {data.shape[0]} samples")
    return data, labels, is_2d


@partial(jax.jit,
         static_argnames=("ratio", "batch_size", "num_patch_point",
                          "phase", "jitter", "jitter_sigma", "jitter_max",
                          "drop_out", "is_2d"))
def _sample_impl(input_array: Array, label_array: Array, key: Array,
                 shape_idx: Array, *, ratio: int, batch_size: int,
                 num_patch_point: int, phase: str, jitter: bool,
                 jitter_sigma: float, jitter_max: float, drop_out: float,
                 is_2d: bool) -> Tuple[Array, Array]:
    """One training batch from device-resident data.

    Module-level on purpose: the data arrays are runtime ARGUMENTS.  An
    earlier version jitted a ``DeviceDataset`` method with ``self``
    static, which traced ``self.input_array``/``self.label_arrays`` as
    compile-time constants — every new dataset instance recompiled the
    sampler (~43 s of a 58 s 200-step run through the axon remote
    compiler, measured by cProfile) and each executable embedded its
    own copy of the dataset.  As arguments they hash by shape/dtype, so
    all same-shape datasets share one compiled program.
    """
    k_seed, k_aug, k_drop = jax.random.split(key, 3)
    shape = jax.lax.dynamic_index_in_dim(
        input_array, shape_idx, keepdims=False)              # (N, 3)
    label = jax.lax.dynamic_index_in_dim(
        label_array, shape_idx, keepdims=False)

    seed_idx = jax.random.randint(
        k_seed, (batch_size,), 0, shape.shape[0])
    seeds = shape[seed_idx]                                  # (B, 3)

    input_patches = knn_group(
        seeds[None], shape[None], num_patch_point
    ).neighbors[0]                                           # (B, K, 3)
    label_patches = knn_group(
        seeds[None], label[None], num_patch_point * ratio
    ).neighbors[0]                                           # (B, rK, 3)

    if phase == "train":
        input_patches, label_patches = augment_batch(
            k_aug, input_patches, label_patches,
            jitter=jitter, jitter_sigma=jitter_sigma,
            jitter_max=jitter_max, is_2d=is_2d)
    else:
        from threepu.ops.normalize import normalize_point_batch_cl

        label_patches, centroid, radius = normalize_point_batch_cl(
            label_patches)
        input_patches = (input_patches - centroid) / radius

    if drop_out < 1.0:
        keep = int(num_patch_point * drop_out)
        perm = jax.random.permutation(k_drop, num_patch_point)
        input_patches = input_patches[:, perm[:keep], :]
    return input_patches, label_patches


class DeviceDataset:
    """Dataset resident in device memory with jit-compiled sampling.

    One :meth:`sample` call produces a full training batch: ``batch_size``
    random seed points on one shape, kNN patch grouping of input and the
    ratio's label resolution around the same seeds (``data.py:119-141``),
    then on-device augmentation.
    """

    def __init__(self, h5_path: str, num_shape_point: int,
                 num_patch_point: int, batch_size: int = 16,
                 up_ratio: int = 16, step_ratio: int = 2,
                 jitter: bool = False, jitter_sigma: float = 0.005,
                 jitter_max: float = 0.01, drop_out: float = 1.0,
                 phase: str = "train"):
        data, labels, is_2d = load_h5_data(h5_path, num_shape_point,
                                           up_ratio, step_ratio)
        self.input_array = jnp.asarray(data)
        self.label_arrays = {r: jnp.asarray(v) for r, v in labels.items()}
        self.is_2d = is_2d
        self.num_shapes = data.shape[0]
        self.batch_size = batch_size
        self.num_patch_point = num_patch_point
        self.jitter = jitter
        self.jitter_sigma = jitter_sigma
        self.jitter_max = jitter_max
        self.drop_out = drop_out
        self.phase = phase
        self.step_ratio = step_ratio
        self.up_ratio = up_ratio

    def sample(self, key: Array, step: int, ratio: int
               ) -> Tuple[Array, Array]:
        """(input (B, K', 3), label (B, rK, 3)) for the shape at
        ``step % num_shapes`` (sequential shape walk, ``data.py:180``)."""
        shape_idx = jnp.asarray(step % self.num_shapes, jnp.int32)
        return _sample_impl(
            self.input_array, self.label_arrays[ratio], key, shape_idx,
            ratio=ratio, batch_size=self.batch_size,
            num_patch_point=self.num_patch_point, phase=self.phase,
            jitter=self.jitter, jitter_sigma=self.jitter_sigma,
            jitter_max=self.jitter_max, drop_out=self.drop_out,
            is_2d=self.is_2d)

class H5Dataset:
    """Reference-compatible wrapper (``data.py:16-196``): stateful
    curriculum mutators, 300 batches per epoch, batches in the
    reference's ``(B, 3, N)`` layout."""

    def __init__(self, h5_path: str, num_shape_point: int,
                 num_patch_point: int, phase: str = "train",
                 up_ratio: int = 16, step_ratio: int = 2,
                 jitter: bool = False, jitter_max: float = 0.01,
                 jitter_sigma: float = 0.005, batch_size: int = 16,
                 drop_out: float = 1.0, seed: int = 0):
        self.device = DeviceDataset(
            h5_path, num_shape_point, num_patch_point,
            batch_size=batch_size, up_ratio=up_ratio,
            step_ratio=step_ratio, jitter=jitter,
            jitter_sigma=jitter_sigma, jitter_max=jitter_max,
            drop_out=drop_out, phase=phase)
        self.batch_size = batch_size
        self.step_ratio = step_ratio
        num_levels = int(math.log(up_ratio, step_ratio))
        self.all_scales = [step_ratio ** r for r in range(1, num_levels + 1)]
        self.curr_scales = list(self.all_scales)
        self._combined = True
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)

    # curriculum mutators (data.py:49-61)
    def add_next_ratio(self):
        self.curr_scales = self.all_scales[
            :min(len(self.curr_scales) + 1, len(self.all_scales))]

    def set_combined(self):
        self._combined = True

    def unset_combined(self):
        self._combined = False

    def set_max_ratio(self, ratio: int):
        n = int(math.log(ratio, self.step_ratio))
        self.curr_scales = [self.step_ratio ** r for r in range(1, n + 1)]

    def sync_to_step(self, step: int, stage_steps: int = 15000,
                     up_ratio: int | None = None):
        """Restore the curriculum state for a given global step, exactly
        like the reference ``train()`` setup (``main.py:141-157``): the
        class itself boots with the *full* curriculum (``data.py:41-44``,
        same as the reference class) and the driver immediately corrects
        it from the step.  Returns ``(stage, progress)`` so the caller
        can also set the Chamfer threshold (progress > 0.6)."""
        from threepu.data.curriculum import stage_progress

        stage, progress = stage_progress(step, stage_steps)
        max_ratio = self.step_ratio ** (stage + 1)
        if up_ratio is not None:
            max_ratio = min(max_ratio, up_ratio)
        self.set_max_ratio(max_ratio)
        if progress > 0.5:
            self.set_combined()
        else:
            self.unset_combined()
        return stage, progress

    def __len__(self):
        return 300 * self.batch_size

    def __getitem__(self, index: int):
        if self._combined:
            ratio = int(self.curr_scales[
                self._rng.integers(len(self.curr_scales))])
        else:
            ratio = int(self.curr_scales[-1])
        self._key, sub = jax.random.split(self._key)
        inp, lab = self.device.sample(sub, index, ratio)
        # reference layout: (B, 3, N)
        return (np.asarray(jnp.swapaxes(inp, 1, 2)),
                np.asarray(jnp.swapaxes(lab, 1, 2)), ratio)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
