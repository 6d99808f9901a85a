"""Numerical parity report: threepu vs the ACTUAL reference torch code.

Runs the untouched reference implementation (/root/reference) on
torch-CPU via :mod:`threepu.testing.reference_bridge` with identical
weights (exported through the ``.pth`` bridge) and prints per-component
agreement, including the full 16x eval cascade that the unit tests keep
at 4x for runtime.

Usage:  JAX_PLATFORMS=cpu python benchmarks/parity_reference.py

The pytest twin (``tests/test_reference_parity.py``) asserts the same
comparisons in CI; this harness is the human-readable artifact.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from threepu.models import Net  # noqa: E402
from threepu.ops import knn as knn_mod  # noqa: E402
from threepu.losses import chamfer_loss  # noqa: E402
from threepu.testing import (make_reference_net,  # noqa: E402
                             load_params_into_reference, import_reference)

HYPER = dict(max_up_ratio=16, step_ratio=2, knn=32, growth_rate=12,
             dense_n=3, fm_knn=5, max_num_point=312)


def _t(x):
    return torch.from_numpy(np.asarray(x).astype(np.float32)).transpose(
        2, 1).contiguous()


def _n(x):
    return x.detach().numpy().transpose(0, 2, 1)


def report(name, ref_arr, arr, rtol=1e-3, atol=2e-4):
    ref_arr = np.asarray(ref_arr)
    arr = np.asarray(arr)
    close = np.isclose(arr, ref_arr, rtol=rtol, atol=atol)
    frac = close.mean()
    maxd = np.abs(arr - ref_arr).max()
    cd = float(chamfer_loss(jnp.asarray(arr), jnp.asarray(ref_arr))) \
        if arr.ndim == 3 and arr.shape[-1] == 3 else float("nan")
    print(f"{name:38s} match={frac:8.4%}  max|d|={maxd:.3e}  "
          f"chamfer={cd:.3e}")
    return frac


def main():
    knn_mod.set_knn_method("exact")  # parity pins exact kNN selection
    ref = import_reference()

    net = Net(**HYPER)
    rng = np.random.default_rng(0)
    xyz0 = jnp.asarray(rng.standard_normal((2, 312, 3)), jnp.float32)
    gt0 = jnp.asarray(rng.standard_normal((2, 312 * 16, 3)), jnp.float32)
    print("initializing threepu params + exporting to reference net ...")
    params = net.init({"params": jax.random.PRNGKey(0),
                       "patch": jax.random.PRNGKey(1)},
                      xyz0, 16, gt0, train=True)["params"]
    ref_net = make_reference_net(**HYPER)
    load_params_into_reference(ref_net, params)

    ok = True

    # eval cascade at full 16x (one 312-pt patch -> 4992 points)
    rng = np.random.default_rng(42)
    xyz = rng.uniform(-1, 1, (1, 312, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True).max()
    ref_net.eval()
    with torch.no_grad():
        out_t = ref_net(_t(xyz), ratio=16)
    out_j = net.apply({"params": params}, jnp.asarray(xyz), 16,
                      train=False)
    # the deep eval cascade re-patches from merged overlapping
    # sub-patches, where FPS/kNN ties on duplicated points scramble
    # point *ordering*; the parity criterion is Chamfer-level
    # (SURVEY §7 "parity under tie-breaking")
    report("eval cascade 16x (312 -> 4992)", _n(out_t), out_j)
    cd16 = float(chamfer_loss(jnp.asarray(out_j),
                              jnp.asarray(_n(out_t))))
    ok &= abs(cd16) < 1e-5

    # train cascade 16x with pinned seeds
    real_randint = torch.randint
    torch.randint = lambda *a, **k: torch.zeros(
        k.get("size"), dtype=k.get("dtype", torch.int64)) \
        if k.get("size") is not None else real_randint(*a, **k)
    real_jrandint = jax.random.randint
    jax.random.randint = (lambda key, shape, minval, maxval,
                          dtype=jnp.int32: jnp.zeros(shape, dtype))
    try:
        xyz = rng.standard_normal((2, 312, 3)).astype(np.float32)
        gt = rng.standard_normal((2, 4992, 3)).astype(np.float32)
        ref_net.train()
        with torch.no_grad():
            tr_t, gt_t = ref_net(_t(xyz), ratio=16, gt=_t(gt))
        tr_j, gt_j = net.apply(
            {"params": params}, jnp.asarray(xyz), 16, jnp.asarray(gt),
            train=True, rngs={"patch": jax.random.PRNGKey(0)})
        ok &= report("train cascade 16x (pinned seeds)",
                     _n(tr_t), tr_j) > 0.99
        ok &= report("train gt patch pairing", _n(gt_t), gt_j,
                     rtol=1e-4, atol=1e-5) > 0.999
    finally:
        torch.randint = real_randint
        jax.random.randint = real_jrandint

    # chamfer values + gradient (weight pinned to reference mode:
    # model.py:72, log2(16/2) = 3 at ratio 2)
    pred = rng.standard_normal((2, 600, 3)).astype(np.float32)
    gtc = rng.standard_normal((2, 500, 3)).astype(np.float32)
    for thr in (None, 2.0):
        crit = ref.model_loss.ChamferLoss()
        if thr is not None:
            crit.set_threshold(thr)
        lt = float(crit(torch.from_numpy(pred), torch.from_numpy(gtc)))
        lj = float(chamfer_loss(jnp.asarray(pred), jnp.asarray(gtc),
                                threshold=thr))
        d = abs(lt - lj) / abs(lt)
        print(f"chamfer loss (threshold={thr}):        "
              f"ref={lt:.6f} threepu={lj:.6f} rel={d:.2e}")
        ok &= d < 1e-4

    print("PARITY:", "OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
