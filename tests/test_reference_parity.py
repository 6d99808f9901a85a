"""Numerical parity against the ACTUAL reference implementation.

Round-1 verification was self-consistency only (numpy oracles + golden
files).  These tests run the untouched reference torch code on CPU (via
``threepu.testing.reference_bridge``, which stubs only the CUDA
extension bindings) with *identical weights* — exported from a threepu
param tree through the file-level ``.pth`` bridge — and assert numeric
agreement of:

- the geometric ops API (``network/operations.py``),
- DenseEdgeConv / Level forwards (``network/layers.py``,
  ``network/upsampler.py:192-374``),
- the full train-mode cascade with pinned re-patch seeds
  (``network/upsampler.py:107-189``),
- the eval-mode patched cascade (``upsampler.py:59-105,126-159``),
- ChamferLoss values and parameter gradients
  (``network/model_loss.py:33-85``, ``model.py:68-77`` weighting, pinned
  to ``loss_weight_mode="reference"``).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from threepu.models import Net
from threepu.models.upsampler import Level
from threepu.ops import knn as knn_mod
from threepu.testing import (import_reference, make_reference_net,
                             load_params_into_reference)

HYPER = dict(max_up_ratio=16, step_ratio=2, knn=32, growth_rate=12,
             dense_n=3, fm_knn=5, max_num_point=312)


def _t(x):
    """numpy/jax channels-last (B, N, C) -> torch NCHW (B, C, N)."""
    return torch.from_numpy(np.asarray(x).astype(np.float32)).transpose(
        2, 1).contiguous()


def _n(x):
    """torch NCHW -> numpy channels-last."""
    return x.detach().numpy().transpose(0, 2, 1)


@pytest.fixture(scope="module", autouse=True)
def _exact_knn():
    old = knn_mod.get_knn_method()
    knn_mod.set_knn_method("exact")  # parity runs pin exact selection
    yield
    knn_mod.set_knn_method(old)


@pytest.fixture(scope="module")
def ref():
    return import_reference()


@pytest.fixture(scope="module")
def nets(tmp_path_factory, ref):
    """(threepu Net, its params, reference torch Net with the SAME
    weights via the .pth file round trip)."""
    net = Net(**HYPER)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((2, 312, 3)), jnp.float32)
    gt = jnp.asarray(rng.standard_normal((2, 312 * 16, 3)), jnp.float32)
    params = net.init({"params": jax.random.PRNGKey(0),
                       "patch": jax.random.PRNGKey(1)},
                      xyz, 16, gt, train=True)["params"]

    # file-level round trip: save_pth -> reference-shaped torch load
    from threepu.io import save_pth
    path = save_pth(str(tmp_path_factory.mktemp("pth")), params, step=77,
                    label="model", epoch=3)
    assert path.endswith("model_3.pth")
    blob = torch.load(path, weights_only=False)
    assert blob["step"] == "77"

    ref_net = make_reference_net(**HYPER)
    missing, unexpected = ref_net.load_state_dict(blob["states"],
                                                  strict=True)
    assert not missing and not unexpected
    return net, params, ref_net


# ------------------------------------------------------------------- ops
class TestOpsParity:
    def test_group_knn(self, ref):
        rng = np.random.default_rng(1)
        q = rng.standard_normal((2, 3, 40)).astype(np.float32)
        p = rng.standard_normal((2, 3, 128)).astype(np.float32)
        for unique in (False, True):
            nbr_t, idx_t, d_t = ref.operations.group_knn(
                8, torch.from_numpy(q), torch.from_numpy(p),
                unique=unique, NCHW=True)
            from threepu.ops import group_knn
            nbr_j, idx_j, d_j = group_knn(8, jnp.asarray(q), jnp.asarray(p),
                                          unique=unique, NCHW=True)
            np.testing.assert_array_equal(idx_t.numpy(), np.asarray(idx_j))
            np.testing.assert_allclose(nbr_t.numpy(), np.asarray(nbr_j),
                                       atol=1e-6)
            np.testing.assert_allclose(d_t.numpy(), np.asarray(d_j),
                                       atol=1e-4)

    def test_furthest_point_sample(self, ref):
        rng = np.random.default_rng(2)
        p = rng.standard_normal((2, 3, 200)).astype(np.float32)
        idx_t, pts_t = ref.operations.furthest_point_sample(
            torch.from_numpy(p), 50)
        from threepu.ops import furthest_point_sample
        idx_j, pts_j = furthest_point_sample(jnp.asarray(p), 50)
        np.testing.assert_array_equal(idx_t.numpy(), np.asarray(idx_j))
        np.testing.assert_allclose(pts_t.numpy(), np.asarray(pts_j),
                                   atol=1e-6)

    def test_gather_points_grad(self, ref):
        rng = np.random.default_rng(3)
        feats = rng.standard_normal((2, 5, 30)).astype(np.float32)
        idx = rng.integers(0, 30, (2, 12)).astype(np.int32)
        ft = torch.from_numpy(feats).requires_grad_(True)
        out_t = ref.operations.gather_points(ft, torch.from_numpy(idx))
        out_t.sum().backward()

        from threepu.ops import gather_points
        fj = jnp.asarray(feats)
        out_j, vjp = jax.vjp(
            lambda f: gather_points(f, jnp.asarray(idx)), fj)
        np.testing.assert_allclose(out_t.detach().numpy(),
                                   np.asarray(out_j), atol=1e-6)
        (gj,) = vjp(jnp.ones_like(out_j))
        np.testing.assert_allclose(ft.grad.numpy(), np.asarray(gj),
                                   atol=1e-6)

    def test_normalize_point_batch(self, ref):
        rng = np.random.default_rng(4)
        p = (rng.standard_normal((3, 3, 64)) * 2 + 1).astype(np.float32)
        pc_t, c_t, r_t = ref.operations.normalize_point_batch(
            torch.from_numpy(p), NCHW=True)
        from threepu.ops import normalize_point_batch
        pc_j, c_j, r_j = normalize_point_batch(jnp.asarray(p), NCHW=True)
        np.testing.assert_allclose(pc_t.numpy(), np.asarray(pc_j),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(c_t.numpy(), np.asarray(c_j), atol=1e-6)
        np.testing.assert_allclose(r_t.numpy(), np.asarray(r_j), atol=1e-6)


# ---------------------------------------------------------------- layers
class TestLayerParity:
    def test_dense_edge_conv(self, nets):
        net, params, ref_net = nets
        rng = np.random.default_rng(5)
        x = rng.standard_normal((2, 64, 24)).astype(np.float32)

        ref_layer = ref_net.levels["level_1"].layer1
        with torch.no_grad():
            y_t, idx_t = ref_layer(_t(x))

        from threepu.models.layers import DenseEdgeConv
        mod = DenseEdgeConv(growth_rate=12, n=3, k=32)
        sub = {"params": params["level_1"]["layer1"]}
        y_j, idx_j = mod.apply(sub, jnp.asarray(x))

        np.testing.assert_array_equal(idx_t.numpy(), np.asarray(idx_j))
        np.testing.assert_allclose(y_t.detach().numpy(),
                                   np.asarray(y_j).transpose(0, 2, 1),
                                   rtol=2e-4, atol=2e-5)

    def test_level1_forward(self, nets):
        net, params, ref_net = nets
        rng = np.random.default_rng(6)
        xyz = rng.standard_normal((2, 312, 3)).astype(np.float32)

        ref_level = ref_net.levels["level_1"]
        with torch.no_grad():
            out_t, feat_t = ref_level(_t(xyz), _t(xyz),
                                      previous_level4=None)

        mod = Level(dense_n=3, growth_rate=12, knn=32, step_ratio=2,
                    fm_knn=5)
        out_j, feat_j = mod.apply({"params": params["level_1"]},
                                  jnp.asarray(xyz), jnp.asarray(xyz))
        np.testing.assert_allclose(_n(out_t), np.asarray(out_j),
                                   rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(_n(feat_t), np.asarray(feat_j),
                                   rtol=2e-4, atol=2e-5)

    def test_level2_with_interlevel_skip(self, nets):
        net, params, ref_net = nets
        rng = np.random.default_rng(7)
        # same explicit inputs to both implementations' level_2
        prev_xyz = rng.standard_normal((2, 312, 3)).astype(np.float32)
        prev_feat = rng.standard_normal((2, 312, 264)).astype(np.float32)
        xyz = rng.standard_normal((2, 312, 3)).astype(np.float32)
        from threepu.ops.normalize import normalize_point_batch_cl
        norm, _, _ = normalize_point_batch_cl(jnp.asarray(xyz))
        norm_np = np.asarray(norm)

        ref_level = ref_net.levels["level_2"]
        with torch.no_grad():
            out_t, feat_t = ref_level(
                _t(xyz), _t(norm_np),
                previous_level4=(_t(prev_xyz), _t(prev_feat)))

        mod = Level(dense_n=3, growth_rate=12, knn=32, step_ratio=2,
                    fm_knn=5)
        out_j, feat_j = mod.apply(
            {"params": params["level_2"]}, jnp.asarray(xyz), norm,
            (jnp.asarray(prev_xyz), jnp.asarray(prev_feat)))
        np.testing.assert_allclose(_n(out_t), np.asarray(out_j),
                                   rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(_n(feat_t), np.asarray(feat_j),
                                   rtol=2e-4, atol=2e-5)


class TestVisCaptureParity:
    def test_intermediates_match(self, nets):
        """The vis phase's captured intermediates (P15): every layer
        feature and kNN graph the reference's ``net.vis`` dict collects
        (``upsampler.py:167-184,285-314``) must come out of our sown
        ``collect_intermediates`` with the same values and the same
        per-patch index offsetting (``main.py:319-327``)."""
        from threepu.vis import collect_intermediates

        net, params, ref_net = nets
        rng = np.random.default_rng(11)
        patches = rng.standard_normal((3, 64, 3)).astype(np.float32)

        ref_net.eval()
        with torch.no_grad():
            ref_net(_t(patches), ratio=2, phase="vis")
        ref_vis = ref_net.vis

        ours = collect_intermediates(net, params, jnp.asarray(patches), 2)

        checked = 0
        for key, (_, v) in ref_vis.items():
            if "." not in key:        # the bare per-level (xyz, feat)
                continue
            name = key.split(".", 1)[1]
            mine = ours[f"level_1.{name}"]
            if "nnIdx" in key:
                # reference: (P, N, k) + offsets; ours: (1, P*N, k)
                np.testing.assert_array_equal(
                    v.numpy().reshape(1, -1, v.shape[-1]), mine)
            else:
                # reference: (P, C, N); ours: (1, P*N, C)
                ref_cl = v.numpy().transpose(0, 2, 1).reshape(
                    1, -1, v.shape[1])
                np.testing.assert_allclose(ref_cl, mine, rtol=2e-4,
                                           atol=2e-5)
            checked += 1
        assert checked >= 9  # 5 feature layers + 4 kNN graphs


class TestAdaptiveLevelParity:
    def test_forward(self, ref):
        """AdaptiveLevel (P10, ``network/upsampler.py:377-512`` — unused
        by the reference ``main.py`` but part of the capability surface)
        against the actual reference class with identical weights via
        the export bridge: the 48->16->1 SampledDenseEdgeConv pyramid,
        the spatial-only interpolate, the [-1,1] code grid, and the
        denormalizing decode must all agree.

        knn=8, not the class default 16: layer4 queries the 16 points
        layer3 left, and a k+1=17 feature-kNN over 16 candidates is
        out of range in BOTH implementations (torch.topk would raise
        too — a latent bug in the reference's unused class at its own
        defaults)."""
        from threepu.models.upsampler import AdaptiveLevel
        from threepu.testing.reference_bridge import reference_state_dict

        hp = dict(dense_n=3, growth_rate=12, knn=8, fm_knn=5)
        mod = AdaptiveLevel(**hp)
        rng = np.random.default_rng(9)
        xyz = rng.standard_normal((2, 256, 3)).astype(np.float32)
        params = mod.init(jax.random.PRNGKey(3), jnp.asarray(xyz),
                          64)["params"]
        out_j, feat_j = mod.apply({"params": params}, jnp.asarray(xyz),
                                  64)

        state = reference_state_dict(params)
        ref_mod = ref.upsampler.AdaptiveLevel(**hp)
        tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
                   for k, v in state.items()}
        missing, unexpected = ref_mod.load_state_dict(tensors,
                                                      strict=True)
        assert not missing and not unexpected
        with torch.no_grad():
            out_t, feat_t = ref_mod(_t(xyz), 64)

        assert out_t.shape == (2, 3, 64)
        np.testing.assert_allclose(_n(out_t), np.asarray(out_j),
                                   rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(_n(feat_t), np.asarray(feat_j),
                                   rtol=2e-4, atol=2e-5)


# ------------------------------------------------------------------ loss
class TestChamferParity:
    @pytest.mark.parametrize("threshold", [None, 2.0])
    def test_loss_value(self, ref, threshold):
        rng = np.random.default_rng(8)
        pred = rng.standard_normal((2, 600, 3)).astype(np.float32)
        gt = rng.standard_normal((2, 500, 3)).astype(np.float32)

        crit = ref.model_loss.ChamferLoss()
        if threshold is not None:
            crit.set_threshold(threshold)
        loss_t = crit(torch.from_numpy(pred), torch.from_numpy(gt))

        from threepu.losses import chamfer_loss
        loss_j = chamfer_loss(jnp.asarray(pred), jnp.asarray(gt),
                              threshold=threshold)
        np.testing.assert_allclose(float(loss_t), float(loss_j), rtol=1e-5)

    def test_loss_grad(self, ref):
        rng = np.random.default_rng(9)
        pred = rng.standard_normal((2, 300, 3)).astype(np.float32)
        gt = rng.standard_normal((2, 400, 3)).astype(np.float32)

        pt = torch.from_numpy(pred).requires_grad_(True)
        loss_t = ref.model_loss.ChamferLoss()(pt, torch.from_numpy(gt))
        loss_t.backward()

        from threepu.losses import chamfer_loss
        gj = jax.grad(lambda p: chamfer_loss(p, jnp.asarray(gt)))(
            jnp.asarray(pred))
        np.testing.assert_allclose(pt.grad.numpy(), np.asarray(gj),
                                   rtol=1e-4, atol=1e-7)



def _assert_cascade_close(ref_out, out, rtol=1e-3, atol=2e-4,
                          max_flip_frac=0.005, cd_tol=1e-5):
    """Cascade outputs must agree pointwise except for kNN/FPS tie-break
    flips (SURVEY §7: CUDA-vs-XLA argmin ties make bitwise parity
    meaningless; the parity target is Chamfer-level).  Assert (a) most
    coordinates match row-for-row to tolerance — flips compound with
    cascade depth, so deeper ratios pass a larger ``max_flip_frac`` —
    and (b) the two clouds are Chamfer-indistinguishable as sets."""
    ref_out = np.asarray(ref_out)
    out = np.asarray(out)
    assert ref_out.shape == out.shape
    close = np.isclose(out, ref_out, rtol=rtol, atol=atol)
    flip_frac = 1.0 - close.mean()
    assert flip_frac <= max_flip_frac, (
        f"{flip_frac:.2%} of elements differ (> {max_flip_frac:.2%}); "
        f"max abs diff {np.abs(out - ref_out).max()}")
    from threepu.losses import chamfer_loss
    cd = float(chamfer_loss(jnp.asarray(out), jnp.asarray(ref_out)))
    assert cd < cd_tol, f"Chamfer between implementations {cd}"


# ------------------------------------------------------------- full model
def _pin_seed_zero(monkeypatch):
    """Pin the train-mode re-patch seed to point 0 on both sides
    (reference: ``upsampler.py:55``; threepu:
    ``Net._extract_patch_train``)."""
    real_randint = torch.randint

    def torch_zero(*args, **kwargs):
        size = kwargs.get("size")
        if size is None:
            return real_randint(*args, **kwargs)
        return torch.zeros(size, dtype=kwargs.get("dtype", torch.int64))

    monkeypatch.setattr(torch, "randint", torch_zero)
    monkeypatch.setattr(
        jax.random, "randint",
        lambda key, shape, minval, maxval, dtype=jnp.int32:
        jnp.zeros(shape, dtype))


class TestNetParity:
    def test_train_forward_16x(self, nets, monkeypatch):
        """Full 4-level train cascade incl. re-patching with gt pairing,
        seeds pinned identically."""
        net, params, ref_net = nets
        _pin_seed_zero(monkeypatch)
        rng = np.random.default_rng(10)
        xyz = rng.standard_normal((2, 312, 3)).astype(np.float32)
        gt = rng.standard_normal((2, 312 * 16, 3)).astype(np.float32)

        ref_net.train()
        with torch.no_grad():
            out_t, gt_t = ref_net(_t(xyz), ratio=16, gt=_t(gt))

        out_j, gt_j = net.apply(
            {"params": params}, jnp.asarray(xyz), 16, jnp.asarray(gt),
            train=True, rngs={"patch": jax.random.PRNGKey(0)})
        _assert_cascade_close(_n(out_t), out_j)
        np.testing.assert_allclose(_n(gt_t), np.asarray(gt_j),
                                   rtol=1e-4, atol=1e-5)

    def test_eval_forward_4x(self, nets):
        """Eval-mode patched cascade: sub-patch extraction (outlier mask
        + FPS seeds + kNN grouping), batched level, merge, FPS restitch
        — pointwise against the reference's dynamic-shape pipeline."""
        net, params, ref_net = nets
        rng = np.random.default_rng(11)
        # uniform ball: no outliers, so the reference's dynamic filter
        # keeps every point and shapes line up with the static pipeline
        xyz = rng.uniform(-1, 1, (1, 312, 3)).astype(np.float32)
        xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True).max()

        ref_net.eval()
        with torch.no_grad():
            out_t = ref_net(_t(xyz), ratio=4)

        out_j = net.apply({"params": params}, jnp.asarray(xyz), 4,
                          train=False)
        _assert_cascade_close(_n(out_t), out_j)

    def test_eval_forward_16x(self, nets):
        """Eval-mode cascade at the canonical 16x: levels 3-4 run on
        *merged* previous sets (M = 3120/6240 with genuine duplicate
        points), engaging the grouped interlevel search and the sorted
        duplicate mask — the exact code the headline benchmark runs —
        against the reference's dynamic re-patch/merge/FPS pipeline
        (``upsampler.py:126-159``)."""
        net, params, ref_net = nets
        rng = np.random.default_rng(13)
        xyz = rng.uniform(-1, 1, (1, 312, 3)).astype(np.float32)
        xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True).max()

        ref_net.eval()
        with torch.no_grad():
            out_t = ref_net(_t(xyz), ratio=16)

        out_j = net.apply({"params": params}, jnp.asarray(xyz), 16,
                          train=False)
        # three FPS re-stitch stages compound order flips (measured:
        # 8.4% of rows shuffled, sets Chamfer-identical at 2.8e-9); the
        # set-level bound is the meaningful assertion here
        _assert_cascade_close(_n(out_t), out_j, max_flip_frac=0.15,
                              cd_tol=1e-7)

    def test_multi_step_training(self, nets, ref):
        """N optimizer steps on BOTH implementations from identical
        weights (via the .pth bridge) on identical batches: Adam(5e-4)
        + grad value clip 1.0 + reference loss weighting
        (``model.py:21-23,53-66,72``).  Asserts the loss trajectories
        track and the final parameters agree — the multi-step
        correctness gap left by the single-step gradient test."""
        import copy

        net, params, ref_net = nets
        steps, batch, weight = 40, 2, 3.0  # ratio 2 -> log2(16/2) = 3
        rng = np.random.default_rng(14)
        batches = [
            (rng.standard_normal((batch, 312, 3)).astype(np.float32),
             rng.standard_normal((batch, 624, 3)).astype(np.float32))
            for _ in range(steps)]

        # ---- reference: the exact Model.optimize() recipe
        ref_train = copy.deepcopy(ref_net)  # keep the fixture pristine
        ref_train.train()
        opt = torch.optim.Adam(ref_train.parameters(), lr=5e-4,
                               betas=(0.9, 0.999))
        crit = ref.model_loss.ChamferLoss()
        losses_t = []
        for x, gt in batches:
            opt.zero_grad()
            out_t, gt_t = ref_train(_t(x), ratio=2, gt=_t(gt))
            loss = crit(out_t.transpose(1, 2).contiguous(),
                        gt_t.transpose(1, 2).contiguous()) * weight
            loss.backward()
            torch.nn.utils.clip_grad_value_(ref_train.parameters(), 1)
            opt.step()
            losses_t.append(float(loss.detach()))

        # ---- threepu: the jitted train_step with the same optimizer
        from threepu.train.model import (TrainState, make_optimizer,
                                         train_step)
        tx = make_optimizer(5e-4)
        # train_step donates its state: start from a COPY so the
        # module-scoped fixture's param buffers stay alive
        params0 = jax.tree_util.tree_map(jnp.copy, params)
        state = TrainState(params=params0, opt_state=tx.init(params0),
                           step=jnp.asarray(0, jnp.int32))
        losses_j = []
        for x, gt in batches:
            state, cd = train_step(
                net, tx, state, jax.random.PRNGKey(0), jnp.asarray(x),
                jnp.asarray(gt), 2, weight_mode="reference")
            losses_j.append(float(cd) * weight)

        losses_t = np.asarray(losses_t)
        losses_j = np.asarray(losses_j)
        rel = np.abs(losses_t - losses_j) / np.abs(losses_t)
        # float noise amplifies chaotically through Chamfer argmin flips
        # (measured envelope: <=1e-4 through step 8, <=1.2% at step 40);
        # early steps must agree tightly, the trajectory must track
        assert rel[:8].max() < 5e-3, rel[:8]
        assert rel.max() < 5e-2, (rel.argmax(), rel.max())

        from threepu.io.checkpoint import export_reference_state
        final_j = export_reference_state(state.params)["states"]
        named = dict(ref_train.named_parameters())
        drift = max(
            float((named[k].detach() - torch.as_tensor(
                np.asarray(v))).abs().max())
            for k, v in final_j.items())
        assert drift < 3e-2, drift  # measured 8.7e-3 at 40 steps

    def test_train_gradients_2x(self, nets, ref):
        """d(weighted chamfer loss)/d(params) parity at ratio 2 (single
        level, no re-patch randomness).  loss_weight_mode is pinned to
        "reference" (``model.py:72``): weight = log2(16/2) = 3."""
        net, params, ref_net = nets
        rng = np.random.default_rng(12)
        xyz = rng.standard_normal((2, 312, 3)).astype(np.float32)
        gt = rng.standard_normal((2, 624, 3)).astype(np.float32)
        weight = 3.0

        ref_net.train()
        ref_net.zero_grad()
        out_t, gt_t = ref_net(_t(xyz), ratio=2, gt=_t(gt))
        # build the loss exactly like model.py:68-73
        loss_t = ref.model_loss.ChamferLoss()(
            out_t.transpose(1, 2).contiguous(),
            gt_t.transpose(1, 2).contiguous()) * weight
        loss_t.backward()

        from threepu.losses import chamfer_loss

        def loss_fn(p):
            out, gt_out = net.apply(
                {"params": p}, jnp.asarray(xyz), 2, jnp.asarray(gt),
                train=True, rngs={"patch": jax.random.PRNGKey(0)})
            return chamfer_loss(out, gt_out) * weight

        loss_j, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(loss_t.detach()), float(loss_j),
                                   rtol=1e-4)

        from threepu.io.checkpoint import export_reference_state
        grad_state = export_reference_state(grads)["states"]
        named = dict(ref_net.named_parameters())
        checked = 0
        for name, g_j in grad_state.items():
            g_t = named[name].grad
            if not name.startswith("levels.level_1."):
                assert g_t is None or float(g_t.abs().max()) == 0.0
                continue
            g_t = g_t.numpy()
            scale = max(np.abs(g_t).max(), 1e-8)
            np.testing.assert_allclose(
                g_t / scale, np.asarray(g_j) / scale, atol=2e-3,
                err_msg=f"grad mismatch for {name}")
            checked += 1
        assert checked == 40  # 20 weight+bias pairs in one Level
