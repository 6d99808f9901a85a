"""End-to-end numeric regression guards (golden values).

A fixed-seed tiny net upsamples a fixed shape through each pipeline
variant (default, bucketed, hierarchical restitch, sharded); every
variant's Chamfer-to-input must stay inside a band recorded when the
pipeline was validated, and the default variant's output statistics
must match recorded values tightly.  Catches silent numeric drift from
refactors the structural tests don't reach — any intentional semantic
change must update the recorded numbers (and say so in the commit).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threepu.models import Net
from threepu.inference import upsample_point_cloud
from oracles import nn_distance_oracle


@pytest.fixture(scope="module")
def golden_setup():
    rng = np.random.default_rng(1234)
    net = Net(max_up_ratio=4, step_ratio=2, knn=8, growth_rate=4,
              dense_n=2, max_num_point=32, fm_knn=3)
    pts = rng.standard_normal((96, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)

    ex = jnp.asarray(pts[None, :32])
    gt = jnp.asarray(rng.standard_normal((1, 128, 3)).astype(np.float32))
    params = net.init({"params": jax.random.PRNGKey(7),
                       "patch": jax.random.PRNGKey(8)},
                      ex, 4, gt, train=True)["params"]
    return net, params, pts


def _chamfer_to_input(out, pts):
    d1, _, d2, _ = nn_distance_oracle(out, pts)
    return d1.mean() + d2.mean()


def test_golden_pipeline_chamfer(golden_setup):
    net, params, pts = golden_setup
    out = np.asarray(upsample_point_cloud(
        net, params, jnp.asarray(pts), 4, num_point=32, num_out=384,
        chunk=4))
    assert out.shape == (384, 3)
    cd = _chamfer_to_input(out, pts)
    # recorded 2026-08-16 (round 1): cd = 0.042870 on cpu x64/highest.
    # Band is generous: structural regressions blow it up by orders of
    # magnitude, float-level noise does not.
    assert 0.005 < cd < 0.4, f"golden chamfer drifted: {cd}"
    # tight drift guard on the same output (recorded 2026-08-19,
    # round 4): coordinate statistics of the deterministic CPU program
    stats = np.array([out.mean(), out.std(),
                      np.abs(out).max()], np.float64)
    recorded = np.array([0.15083234, 0.57259727, 1.23932910])
    np.testing.assert_allclose(stats, recorded, rtol=1e-4, atol=1e-6,
                               err_msg="default-pipeline output "
                               "statistics drifted from the recorded "
                               "golden values")


def test_golden_bucketed(golden_setup):
    """The bucketed program (pad + mask to a static bucket) is a
    DISTINCT compiled program from the exact-size one; its recorded
    band guards refactors of the masking/padding plumbing."""
    net, params, pts = golden_setup
    from threepu.inference import upsample_shape

    _, out = upsample_shape(net, params, pts, 4, num_point=32, chunk=4,
                            bucket=128)
    assert out.shape == (384, 3)
    cd = _chamfer_to_input(out, pts)
    assert 0.005 < cd < 0.4, f"bucketed golden chamfer drifted: {cd}"
    stats = np.array([out.mean(), out.std(), np.abs(out).max()])
    recorded = np.array([0.15083234, 0.57259727, 1.23932910])
    np.testing.assert_allclose(stats, recorded, rtol=1e-4, atol=1e-6)


def test_golden_hierarchical_restitch(golden_setup):
    """restitch_groups=2: the Morton-stratified final FPS replaces the
    exact one — a different selection, its own recorded golden."""
    net, params, pts = golden_setup
    out = np.asarray(upsample_point_cloud(
        net, params, jnp.asarray(pts), 4, num_point=32, num_out=384,
        chunk=4, restitch_groups=2))
    assert out.shape == (384, 3)
    cd = _chamfer_to_input(out, pts)
    assert 0.005 < cd < 0.4, f"restitch golden chamfer drifted: {cd}"
    stats = np.array([out.mean(), out.std(), np.abs(out).max()])
    recorded = np.array([0.17124039, 0.56886923, 1.23932910])
    np.testing.assert_allclose(stats, recorded, rtol=1e-4, atol=1e-6)


def test_shipped_default_knobs():
    """Pin every shipped default knob (VERDICT r4 #7): a default flip
    or dispatch-gate change must fail HERE, in the CPU suite, not on
    chip.  Any intentional change must update these values AND the
    chip measurements that justified them (benchmarks/RESULTS.md)."""
    from threepu.ops import knn as knn_mod
    from threepu.ops import select_pallas as sp
    from threepu.ops import interlevel_pallas as il
    from threepu import inference

    assert knn_mod.DEFAULT_METHOD == "exact"
    assert il.SWEEP_V2 is False                      # round-5 chip A/B pending
    assert il.SELECT_UNIT_V2 == 1024
    assert knn_mod.EXACT_SELECT_PALLAS is True       # round-4 chip A/B
    assert knn_mod.EXACT_SPLITS == 0                 # split-top-k loses 3-5x
    assert knn_mod._PALLAS_SELECT_MAX_K == 64        # cap-512 A/B: no win
    assert knn_mod._PALLAS_SELECT_MAX_BLOCK == 1 << 20
    assert sp._MAX_TILE_ELEMS == 1 << 17             # ~53 B/elem footprint
    assert inference.DEFAULT_RESTITCH_GROUPS == 8    # round-4 quality gate
    assert inference.RESTITCH_AUTO_MIN_OUT == 16384
    assert inference.resolve_restitch_groups(None, 80000) == 8
    assert inference.resolve_restitch_groups(None, 384) == 1
    assert inference.resolve_restitch_groups(1, 80000) == 1


def test_golden_default_tpu_dispatch(golden_setup, monkeypatch):
    """Execute the EXACT shipped TPU dispatch path on CPU: the real
    gate conditions route eligible selections through the Pallas kernel
    (interpret mode standing in for the chip).  Asserts (a) the kernel
    actually ENGAGES at the expected sites — a gate regression that
    silently stops dispatching cannot hide behind bit-identical
    outputs — and (b) the output is bit-identical to the plain
    program's, pinned to the same recorded golden statistics."""
    net, params, pts = golden_setup
    import threepu.ops.select_pallas as sp
    from threepu.ops import knn as knn_mod

    jax.clear_caches()
    base = np.asarray(upsample_point_cloud(
        net, params, jnp.asarray(pts), 4, num_point=32, num_out=384,
        chunk=4))

    calls = []
    real = sp.select_pallas

    def counting(d, k, **kw):
        calls.append((tuple(d.shape), k))
        return real(d, k, **kw)

    monkeypatch.setattr(sp, "select_pallas", counting)
    knn_mod.set_select_interpret(True)
    jax.clear_caches()
    try:
        out = np.asarray(upsample_point_cloud(
            net, params, jnp.asarray(pts), 4, num_point=32, num_out=384,
            chunk=4))
    finally:
        knn_mod.set_select_interpret(False)
        jax.clear_caches()
    assert calls, "the default dispatch no longer engages the kernel"
    for shape, k in calls:
        assert k <= knn_mod._PALLAS_SELECT_MAX_K
        assert shape[-2] >= 8
    np.testing.assert_array_equal(out, base)
    stats = np.array([out.mean(), out.std(), np.abs(out).max()])
    recorded = np.array([0.15083234, 0.57259727, 1.23932910])
    np.testing.assert_allclose(stats, recorded, rtol=1e-4, atol=1e-6)


def test_golden_sharded(golden_setup):
    """The mesh pipeline (shard_map over patches + single merge
    all-gather) on the 8-device CPU mesh must reproduce the recorded
    default-program statistics (it IS the same selection on CPU)."""
    net, params, pts = golden_setup
    from threepu.parallel import make_mesh

    mesh = make_mesh(8)
    out = np.asarray(upsample_point_cloud(
        net, params, jnp.asarray(pts), 4, num_point=32, num_out=384,
        chunk=4, mesh=mesh))
    assert out.shape == (384, 3)
    cd = _chamfer_to_input(out, pts)
    assert 0.005 < cd < 0.4, f"sharded golden chamfer drifted: {cd}"
    stats = np.array([out.mean(), out.std(), np.abs(out).max()])
    recorded = np.array([0.15083234, 0.57259727, 1.23932910])
    np.testing.assert_allclose(stats, recorded, rtol=1e-3, atol=1e-5)
