"""The progressive upsampling cascade.

TPU-native re-design of ``network/upsampler.py``.  Semantics match the
reference exactly where shapes are static; the dynamic-shape test-time
constructs are re-expressed as static-shape masked programs:

- the per-patch python loop of ``main.py:237-244`` becomes a batched
  (vmappable) cascade over all patches at once;
- test-time outlier *filtering* (``upsampler.py:63-75``) becomes an
  outlier *mask*: masked points are unselectable by FPS seeding and rank
  last in kNN grouping, so patch content matches the reference on clean
  data while shapes stay static (sub-patch count is derived from the
  unfiltered count);
- test-time patch merge + FPS re-stitch (``upsampler.py:149-159``) is a
  reshape + masked FPS, fully on device.

Layout is channels-last ``(B, N, 3)`` throughout (the reference is
``(B, 3, N)``); wrappers in :mod:`threepu.compat` restore the reference
calling convention.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from threepu.models.layers import DenseConv, DenseEdgeConv, SampledDenseEdgeConv
from threepu.ops import knn_group, fps_indices, gather_nd
from threepu.ops.normalize import normalize_point_batch_cl

#: trace-time toggle: pad the eval cascade's restitch/interlevel shapes
#: to the deepest level's sizes so every level shares one Pallas kernel
#: instance.  Default OFF — measured end-to-end on the v5e headline
#: pipeline (round 3), natural per-level shapes win on BOTH axes:
#: steady state 1.476 vs 1.593 s/shape (the shallow levels stop paying
#: padded-width FPS/interlevel work) AND time-to-first-shape 54.6 vs
#: 69.5 s (two small Mosaic instances compile faster than one
#: deepest-level-sized instance).  See benchmarks/RESULTS.md round 3.
SHARE_EVAL_INSTANCES = False

Array = jax.Array


def exponential_distance(points: Array, knn_points: Array
                         ) -> Tuple[Array, Array]:
    """Interpolation weights for the interlevel skip
    (``network/upsampler.py:232-250``).

    points: (B, N, C); knn_points: (B, N, K, C).
    Returns (distance (B, N, K), weight (B, N, K)), both stop-gradiented
    — the reference detaches both (``upsampler.py:245,249``).
    """
    d = jnp.sum((points[..., :, None, :] - knn_points) ** 2, axis=-1)
    d = jax.lax.stop_gradient(d)
    h = jnp.mean(jnp.min(d, axis=-1, keepdims=True), axis=-2, keepdims=True)
    w = jax.lax.stop_gradient(jnp.exp(-d / (h / 2.0)))
    return d, w


def gen_1d_grid(num: int) -> np.ndarray:
    """(num, 1) code column, linspace(-0.2, 0.2)
    (``network/upsampler.py:264-270``)."""
    return np.linspace(-0.2, 0.2, num, dtype=np.float32).reshape(num, 1)


def gen_grid(grid_size: int) -> np.ndarray:
    """(grid_size**2, 2) code grid (``network/upsampler.py:252-262``)."""
    x = np.linspace(-0.2, 0.2, grid_size, dtype=np.float32)
    gx, gy = np.meshgrid(x, x, indexing="ij")
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


class Level(nn.Module):
    """One 2x (step_ratio) upsampling unit (``network/upsampler.py:192-374``).

    Channel schedule with defaults (growth 12, dense_n 3):
    3 -> 24 -> 84 -> 144 -> 204 -> 264, then code-grid expansion and the
    coordinate regressor 128 -> 128 -> 64 -> 3 with residual skip.

    Note the reference quirk: ``Net`` never forwards its ``fm_knn`` to
    ``Level`` (``upsampler.py:24-26``), so the interlevel skip always
    uses the Level default of 5 regardless of the CLI flag.  We keep
    ``fm_knn`` configurable with the same default.
    """

    dense_n: int = 3
    growth_rate: int = 12
    knn: int = 16
    fm_knn: int = 5
    step_ratio: int = 2
    dtype: Optional[object] = None  # feature-compute dtype (e.g. bf16)
    dedup: bool = True  # exact duplicate masking in feature kNN; disable
    #                     only when input clouds are duplicate-free

    @property
    def code(self) -> np.ndarray:
        # INTENDED-BEHAVIOUR FIX (like the chamfer backward / jitter
        # dtype fixes): for step_ratio >= 4 the reference calls
        # gen_grid(round(sqrt(r))**2) (``upsampler.py:203-204``), which
        # yields r**2 code points and breaks its own cascade; this
        # implements the intended r-point 2D grid expansion.
        if self.step_ratio < 4:
            return gen_1d_grid(self.step_ratio)
        expansion = round(math.sqrt(self.step_ratio)) ** 2
        return gen_grid(round(math.sqrt(expansion)))

    @nn.compact
    def __call__(self, xyz: Array, xyz_normalized: Array,
                 previous_level4: Optional[Tuple[Array, Array]] = None,
                 prev_group: int = 1,
                 prev_dup: Optional[Array] = None,
                 pallas_ec: bool = False,
                 prev_pad_m: int = 0
                 ) -> Tuple[Array, Array]:
        """xyz/xyz_normalized: (B, N, 3) (un/normalized input points).
        previous_level4: optional (prev_xyz, prev_feat) from the previous
        level, for the feature-propagation skip.  When every group of
        ``prev_group`` consecutive batch elements shares ONE previous
        patch (the test-time sub-patch pipeline: the reference expands
        previous level tensors per sub-patch, ``upsampler.py:319-323``),
        prev arrays have batch ``B / prev_group`` and the kNN search runs
        at that batch — avoiding an ``n_sub``-fold materialization of the
        previous features.  ``prev_dup`` is the precomputed duplicate
        mask of ``prev_xyz`` (merged patches genuinely contain duplicate
        points, so unique semantics matter here).

        Returns (upsampled xyz (B, N*r, 3) in normalized frame,
        point features (B, N, 264))."""
        b, n, _ = xyz_normalized.shape
        # the vis phase pairs every capture with THIS level's input
        # cloud (the reference keeps (old_xyz, v) per level,
        # upsampler.py:167-184) — levels beyond 1 run on re-patched
        # clouds, so nnIdx must not be plotted against level-1 points
        self.sow("intermediates", "xyz_in", xyz)
        ec = dict(growth_rate=self.growth_rate, n=self.dense_n, k=self.knn,
                  dtype=self.dtype)
        # duplicate mask once on 3-channel xyz; identical input points
        # produce identical features, so this mask is valid for every
        # feature-space kNN below (replaces the reference's per-call
        # host np.unique round trip, operations.py:193-204)
        if self.dedup:
            from threepu.ops import duplicate_mask
            dup = duplicate_mask(xyz_normalized)
        else:
            dup = jnp.zeros(xyz_normalized.shape[:-1], bool)

        x = DenseConv(24, activation=None, dtype=self.dtype,
                      name="layer0")(xyz_normalized)
        self.sow("intermediates", "layer_0", x)

        y, idx = DenseEdgeConv(**ec, name="layer1")(x, dup_mask=dup, pallas=pallas_ec)
        x = jnp.concatenate([y, x], axis=-1)                     # 84
        self.sow("intermediates", "layer_1", x)
        self.sow("intermediates", "nnIdx_layer_0", idx)

        y, idx = DenseEdgeConv(**ec, name="layer2")(
            DenseConv(24, "relu", dtype=self.dtype, name="layer2_prep")(x), dup_mask=dup,
            pallas=pallas_ec)
        x = jnp.concatenate([y, x], axis=-1)                     # 144
        self.sow("intermediates", "layer_2", x)
        self.sow("intermediates", "nnIdx_layer_1", idx)

        y, idx = DenseEdgeConv(**ec, name="layer3")(
            DenseConv(24, "relu", dtype=self.dtype, name="layer3_prep")(x), dup_mask=dup,
            pallas=pallas_ec)
        x = jnp.concatenate([y, x], axis=-1)                     # 204
        self.sow("intermediates", "layer_3", x)
        self.sow("intermediates", "nnIdx_layer_2", idx)

        y, idx = DenseEdgeConv(**ec, name="layer4")(
            DenseConv(24, "relu", dtype=self.dtype, name="layer4_prep")(x), dup_mask=dup,
            pallas=pallas_ec)
        x = jnp.concatenate([y, x], axis=-1)                     # 264
        self.sow("intermediates", "layer_4", x)
        self.sow("intermediates", "nnIdx_layer_3", idx)

        if previous_level4 is not None and self.fm_knn > 0:
            from threepu.ops.gather import batched_gather
            prev_xyz, prev_feat = previous_level4
            k = self.fm_knn
            if (prev_group > 1 and prev_dup is not None
                    and jax.default_backend() == "tpu"):
                # fused Pallas path: selection + feature gather +
                # weighting in one VMEM-resident kernel (exact top-k;
                # bf16 features in the selection matmuls); removes the
                # (P, NQ, M) distance matrix that otherwise caps memory
                from threepu.ops.interlevel_pallas import (
                    interlevel_interp_pallas)
                if prev_pad_m > prev_xyz.shape[1]:
                    # pad the previous set to the cascade's deepest-
                    # level size so every level's kernel call shares
                    # one instance; padded rows are marked duplicate
                    # (the kernel displaces those to 1e15 — never
                    # selected)
                    pm = prev_pad_m - prev_xyz.shape[1]
                    prev_xyz = jnp.pad(prev_xyz,
                                       ((0, 0), (0, pm), (0, 0)))
                    prev_feat = jnp.pad(prev_feat,
                                        ((0, 0), (0, pm), (0, 0)))
                    prev_dup = jnp.pad(prev_dup, ((0, 0), (0, pm)),
                                       constant_values=True)
                interp = interlevel_interp_pallas(
                    xyz, x.astype(jnp.float32), prev_xyz,
                    prev_feat.astype(jnp.float32), prev_dup,
                    k).astype(x.dtype)
            else:
                if prev_group > 1:
                    # search at top-patch batch: sub-patches in a group
                    # share the same previous set
                    p = b // prev_group
                    q_xyz = xyz.reshape(p, prev_group * n, 3)
                    res = knn_group(q_xyz, prev_xyz, k, unique=True,
                                    dup_mask=prev_dup)
                    nbrs = res.neighbors.reshape(b, n, k, 3)
                    knn_feats = batched_gather(
                        prev_feat, res.idx).reshape(b, n, k, -1)
                else:
                    res = knn_group(xyz, prev_xyz, k, unique=True,
                                    dup_mask=prev_dup)
                    nbrs = res.neighbors
                    knn_feats = batched_gather(prev_feat, res.idx)
                # weights normalized per sub-patch (reference h is a
                # per-batch element statistic, upsampler.py:247-248)
                _, s_w = exponential_distance(xyz, nbrs)
                _, f_w = exponential_distance(x, knn_feats)
                w = s_w * f_w
                w = w / jnp.sum(w + 1e-5, axis=-1, keepdims=True)
                interp = jnp.sum(w[..., None] * knn_feats, axis=-2)
            x = 0.2 * interp + x

        point_features = x

        code = jnp.asarray(self.code, dtype=x.dtype)             # (r, L)
        r = code.shape[0]
        # point-major expansion: output slot n*r + j holds point n, code j
        x = jnp.broadcast_to(x[:, :, None, :], (b, n, r, x.shape[-1]))
        x = x.reshape(b, n * r, -1)
        code = jnp.broadcast_to(code[None, None], (b, n, r, code.shape[-1]))
        code = code.reshape(b, n * r, -1)
        x = jnp.concatenate([x, code], axis=-1)

        x = DenseConv(128, "relu", dtype=self.dtype, name="up_layer1")(x)
        x = DenseConv(128, "relu", dtype=self.dtype, name="up_layer2")(x)
        x = DenseConv(64, "relu", dtype=self.dtype, name="fc_layer1")(x)
        # coordinates regress in float32 regardless of feature dtype
        x = DenseConv(3, None, name="fc_layer2")(x.astype(jnp.float32))

        residual = jnp.broadcast_to(
            xyz_normalized[:, :, None, :], (b, n, r, 3)).reshape(b, n * r, 3)
        return x + residual, point_features


class Net(nn.Module):
    """Progressive cascade of identical 2x Levels
    (``network/upsampler.py:9-189``).

    Train path (``__call__`` with ``train=True``): static shapes; when a
    level's input exceeds ``max_num_point``, a fresh sub-patch around one
    random seed per element is cut together with the matching gt patch
    (``upsampler.py:39-58,126-147``).  Needs an ``rngs={'patch': key}``.

    Eval path: fully batched static pipeline, see module docstring.
    """

    max_up_ratio: int = 16
    step_ratio: int = 2
    knn: int = 16
    growth_rate: int = 12
    dense_n: int = 3
    max_num_point: int = 312
    fm_knn: int = 5
    dtype: Optional[object] = None  # feature-compute dtype (e.g. bf16)
    dedup: bool = True

    @property
    def num_levels(self) -> int:
        return int(math.log(self.max_up_ratio, self.step_ratio))

    def setup(self):
        self.levels = [
            Level(dense_n=self.dense_n, growth_rate=self.growth_rate,
                  knn=self.knn, step_ratio=self.step_ratio,
                  fm_knn=self.fm_knn, dtype=self.dtype, dedup=self.dedup,
                  name=f"level_{l}")
            for l in range(1, self.num_levels + 1)
        ]

    # ---------------------------------------------------------- train
    def __call__(self, xyz: Array, ratio: Optional[int] = None,
                 gt: Optional[Array] = None, train: bool = True):
        ratio = ratio or self.max_up_ratio
        if train:
            assert gt is not None, "training requires gt"
            out = self._forward_train(xyz, ratio, gt)
        else:
            out = self.upsample(xyz, ratio)
        if self.is_initializing():
            # touch levels the example ratio didn't reach so the param
            # tree is complete whatever ratio the net is later run at
            # (level param shapes are input-size independent)
            used = int(math.log(ratio, self.step_ratio))
            for l in range(used, self.num_levels):
                self.levels[l](xyz, xyz, None)
        return out

    def _forward_train(self, xyz: Array, ratio: int, gt: Array):
        num_levels = int(math.log(ratio, self.step_ratio))
        num_point = xyz.shape[1]
        max_np = min(num_point, self.max_num_point)

        old_xyz = old_feats = None
        for l in range(1, num_levels + 1):
            curr_ratio = self.step_ratio ** l
            if l == 1:
                old_xyz = xyz
                xyz, feats = self.levels[0](xyz, xyz, None)
                old_feats = feats
            else:
                if xyz.shape[1] > max_np:
                    gt_k = max_np * ratio // curr_ratio * self.step_ratio
                    patch_xyz, gt = self._extract_patch_train(
                        xyz, max_np, gt, gt_k)
                else:
                    patch_xyz = xyz
                norm, centroid, radius = normalize_point_batch_cl(patch_xyz)
                new_xyz, feats = self.levels[l - 1](
                    patch_xyz, norm, (old_xyz, old_feats))
                xyz = new_xyz * radius + centroid
                old_xyz = patch_xyz
                old_feats = feats
        return xyz, gt

    def _extract_patch_train(self, xyz: Array, k: int, gt: Array,
                             gt_k: int):
        """One random-seed kNN patch per element, with the matched gt
        patch around the same seed (``upsampler.py:51-58,98-101``)."""
        b, n, _ = xyz.shape
        key = self.make_rng("patch")
        seed_idx = jax.random.randint(key, (b, 1), 0, n)
        seeds = gather_nd(xyz, seed_idx)                      # (B, 1, 3)
        patch = knn_group(seeds, xyz, k, unique=False).neighbors[:, 0]
        gt_patch = knn_group(seeds, gt, gt_k, unique=False).neighbors[:, 0]
        return patch, gt_patch

    # ----------------------------------------------------------- eval
    def upsample(self, xyz: Array, ratio: Optional[int] = None) -> Array:
        """Batched inference cascade: xyz (P, N, 3) normalized patches ->
        (P, N*ratio, 3) in the same normalized frame."""
        ratio = ratio or self.max_up_ratio
        num_levels = int(math.log(ratio, self.step_ratio))
        p, num_point, _ = xyz.shape
        max_np = min(num_point, self.max_num_point)

        # forward-only fused edge-conv chain kernel (eval path only —
        # it has no VJP); trace-time decision like the interlevel kernel
        from threepu.ops import edgeconv_pallas
        pallas_ec = edgeconv_pallas.enabled_for_backend()

        # every re-patching level pads its merged cloud / pick count up
        # to the DEEPEST level's sizes so all restitch FPS calls share
        # ONE Pallas kernel instance (axon kernel compiles are ~minute-
        # scale each; FPS selection is prefix-consistent and padded rows
        # are masked, so selection is unchanged).  TPU-only: on CPU the
        # scan path has no per-instance cost to amortize.
        merge_pad = pick_pad = prev_pad_m = 0
        if SHARE_EVAL_INSTANCES and jax.default_backend() == "tpu":
            prev_size = num_point              # level-1 input size
            for l in range(2, num_levels + 1):
                n_c = num_point * self.step_ratio ** (l - 1)
                if n_c > max_np:
                    n_s = int(n_c / max_np * 5)
                    merge_pad = max(merge_pad,
                                    n_s * max_np * self.step_ratio)
                    pick_pad = max(pick_pad,
                                   num_point * self.step_ratio ** l)
                    # the interlevel kernel at this level searches a
                    # previous set of prev_size points
                    prev_pad_m = max(prev_pad_m, prev_size)
                    prev_size = n_s * max_np
                else:
                    prev_size = n_c

        old_xyz = old_feats = prev_invalid = None
        for l in range(1, num_levels + 1):
            curr_ratio = self.step_ratio ** l
            if l == 1:
                old_xyz = xyz
                xyz, old_feats = self.levels[0](xyz, xyz, None,
                                                pallas_ec=pallas_ec)
                continue

            n_cur = xyz.shape[1]
            if n_cur > max_np:
                n_sub = int(n_cur / max_np * 5)
                sub, true_sub = self._extract_patch_eval(xyz, max_np,
                                                         n_sub)
                flat = sub.reshape(p * n_sub, max_np, 3)
                norm, centroid, radius = normalize_point_batch_cl(flat)
                # previous arrays stay at top-patch batch; the Level runs
                # its interlevel kNN grouped (prev_group) and we hand it
                # the merged-patch duplicate mask once.  Phantom previous
                # rows (see _extract_patch_eval) fold into the mask: like
                # duplicates, they must never be selected.
                from threepu.ops import duplicate_mask
                prev_dup = duplicate_mask(old_xyz)
                if prev_invalid is not None:
                    prev_dup = prev_dup | prev_invalid
                new_xyz, feats = self.levels[l - 1](
                    flat, norm, (old_xyz, old_feats),
                    prev_group=n_sub, prev_dup=prev_dup,
                    pallas_ec=pallas_ec, prev_pad_m=prev_pad_m)
                new_xyz = new_xyz * radius + centroid
                # merge sub-patches back per top patch, then FPS re-stitch
                # over the REAL patches only (phantom patches are static-
                # shape padding beyond the reference's dynamic count)
                patch_valid = (jnp.arange(n_sub)[None, :]
                               < true_sub[:, None])          # (p, n_sub)
                n_lvl = new_xyz.shape[1]
                merged = new_xyz.reshape(p, n_sub * n_lvl, 3)
                merge_valid = jnp.broadcast_to(
                    patch_valid[:, :, None],
                    (p, n_sub, n_lvl)).reshape(p, -1)
                n_out = num_point * curr_ratio
                from threepu.ops.fps import _dispatch_fps
                n_merged = merged.shape[1]
                if merge_pad > n_merged or pick_pad > n_out:
                    merged_p = jnp.pad(
                        merged, ((0, 0), (0, merge_pad - n_merged),
                                 (0, 0)))
                    mv = jnp.pad(merge_valid,
                                 ((0, 0), (0, merge_pad - n_merged)))
                    sel = _dispatch_fps(merged_p, pick_pad, mv,
                                        None, m_eff=n_out)[:, :n_out]
                    xyz = gather_nd(merged_p, sel)
                else:
                    sel = _dispatch_fps(merged, n_out, merge_valid, None)
                    xyz = gather_nd(merged, sel)
                old_xyz = flat.reshape(p, n_sub * max_np, 3)
                old_feats = feats.reshape(p, n_sub * max_np, -1)
                prev_invalid = ~jnp.broadcast_to(
                    patch_valid[:, :, None],
                    (p, n_sub, max_np)).reshape(p, -1)
            else:
                norm, centroid, radius = normalize_point_batch_cl(xyz)
                new_xyz, feats = self.levels[l - 1](
                    xyz, norm, (old_xyz, old_feats),
                    pallas_ec=pallas_ec)
                old_xyz = xyz
                old_feats = feats
                prev_invalid = None
                xyz = new_xyz * radius + centroid
        return xyz

    def _extract_patch_eval(self, xyz: Array, k: int, n_sub: int
                            ) -> Tuple[Array, Array]:
        """Static-shape sub-patch extraction (``upsampler.py:59-86``):
        outliers (NN distance >= 5x mean) are masked out of FPS seeding
        and rank last in grouping instead of being dropped.

        The reference derives its sub-patch count from the FILTERED
        cloud (``upsampler.py:74-76``: ``int(n_filtered / k * 5)``), a
        data-dependent value.  ``n_sub`` here is the static upper bound
        (unfiltered count); the traced per-element ``true_sub`` is the
        reference's dynamic count.  FPS selection is prefix-consistent,
        so the first ``true_sub`` seeds equal the reference's seeds and
        patches beyond them are *phantoms* — callers mask them out of
        the merge and the next level's previous-set.

        Returns (patches ``(p, n_sub, k, 3)``, ``true_sub (p,)`` int32).
        """
        from threepu.ops.chamfer import self_nn_dist2
        closest = self_nn_dist2(xyz)
        mask = closest < 5.0 * jnp.mean(closest, axis=-1, keepdims=True)
        n_valid = jnp.sum(mask, axis=-1).astype(jnp.int32)
        true_sub = jnp.clip((n_valid * 5) // k, 1, n_sub)
        seed_idx = fps_indices(xyz, n_sub, valid_mask=mask)
        seeds = gather_nd(xyz, seed_idx)
        return knn_group(seeds, xyz, k, valid_mask=mask).neighbors, true_sub


class AdaptiveLevel(nn.Module):
    """Upsampling unit with free target point count
    (``network/upsampler.py:377-512``; unused by the reference ``main.py``
    but part of the capability surface).  Downsamples 48 -> 16 -> 1 to a
    global feature via :class:`SampledDenseEdgeConv`, then decodes
    ``round(sqrt(target))**2`` points from a 2D code grid in [-1, 1]."""

    dense_n: int = 3
    growth_rate: int = 12
    knn: int = 16
    fm_knn: int = 5
    dtype: Optional[object] = None

    @staticmethod
    def gen_grid(grid_size: int) -> np.ndarray:
        x = np.linspace(-1.0, 1.0, grid_size, dtype=np.float32)
        gx, gy = np.meshgrid(x, x, indexing="ij")
        return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)

    def interpolate(self, prev_xyz, xyz, prev_feat):
        """Spatial-only exp-distance interpolation
        (``upsampler.py:441-465``)."""
        res = knn_group(xyz, prev_xyz, self.fm_knn, unique=True)
        from threepu.ops.gather import batched_gather
        feats = batched_gather(prev_feat, res.idx)
        d = jnp.sum((xyz[..., :, None, :] - res.neighbors) ** 2, axis=-1)
        d = jax.lax.stop_gradient(d)
        h = jnp.mean(jnp.min(d, axis=-1, keepdims=True), axis=-2,
                     keepdims=True) + 1e-5
        w = jax.lax.stop_gradient(jnp.exp(-d / (h / 2.0)))
        w = w / jnp.sum(w + 1e-5, axis=-1, keepdims=True)
        return jnp.sum(w[..., None] * feats, axis=-2)

    @nn.compact
    def __call__(self, xyz: Array, target_n_point: int):
        b = xyz.shape[0]
        code = jnp.asarray(
            self.gen_grid(round(math.sqrt(target_n_point))),
            dtype=xyz.dtype)                                  # (T, 2)
        ec = dict(growth_rate=self.growth_rate, n=self.dense_n, k=self.knn)

        xyz_n, centroid, radius = normalize_point_batch_cl(xyz)
        x = DenseConv(24, activation=None, name="layer0")(xyz_n)
        y, _ = DenseEdgeConv(**ec, name="layer1")(x)
        x = jnp.concatenate([y, x], axis=-1)

        y, s_xyz, _ = SampledDenseEdgeConv(**ec, name="layer2")(
            DenseConv(24, "relu", dtype=self.dtype, name="layer2_prep")(x), 48, xyz_n)
        x = jnp.concatenate([y, self.interpolate(xyz_n, s_xyz, x)], axis=-1)
        prev_xyz = s_xyz

        y, s_xyz, _ = SampledDenseEdgeConv(**ec, name="layer3")(
            DenseConv(24, "relu", dtype=self.dtype, name="layer3_prep")(x), 16, prev_xyz)
        x = jnp.concatenate([y, self.interpolate(prev_xyz, s_xyz, x)], axis=-1)
        prev_xyz = s_xyz

        y, s_xyz, _ = SampledDenseEdgeConv(**ec, name="layer4")(
            DenseConv(24, "relu", dtype=self.dtype, name="layer4_prep")(x), 1, prev_xyz)
        x = jnp.concatenate([y, self.interpolate(prev_xyz, s_xyz, x)], axis=-1)

        global_features = x                                   # (B, 1, 264)
        t = code.shape[0]
        x = jnp.broadcast_to(x, (b, t, x.shape[-1]))
        x = jnp.concatenate(
            [x, jnp.broadcast_to(code[None], (b, t, 2))], axis=-1)

        x = DenseConv(128, "relu", name="up_layer1")(x)
        x = DenseConv(128, "relu", name="up_layer2")(x)
        x = DenseConv(64, "relu", name="fc_layer1")(x)
        x = DenseConv(3, None, name="fc_layer2")(x)

        x = x * jax.lax.stop_gradient(radius) + jax.lax.stop_gradient(centroid)
        return x, global_features
