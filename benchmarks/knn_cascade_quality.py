"""Quality-gate the approx-selection lever at trained weights.

Round-4 finding (``eval_gap.py`` + ``select_bench.py``, RESULTS.md):
the eval cascade is SELECTION-bound — ``lax.top_k`` k=33 over the
(320,312,312) conv distance matrix costs 14.9 ms vs 9.4 ms for
``lax.approx_min_k`` at recall 0.95, and the exact split-select
reformulation LOSES 3-5x (the partial-reduce win is internal to the
PartialReduce TPU op, not reproducible from composed top_ks).  The only
faster-than-top_k selection changes semantics, so — exactly like the
``restitch_groups`` decision (``restitch_quality.py``) and the round-3
kNN-ablation that settled ``exact`` — the question is whether it moves
the QUALITY metric at trained weights.

This bench loads a production-trained checkpoint, 16x-upsamples
held-out shapes under each selection method (fresh trace per method:
the method is trace-time state, not a jit cache key), and reports
held-out Chamfer vs the dense ground truth, cross-method set
difference scaled by the output's own NN spacing^2, s/shape, and
compile time.  Decision rule: a default change needs BOTH a faster
steady state AND held-out Chamfer indistinguishable from exact.

Run on the TPU:
    python benchmarks/knn_cascade_quality.py \
        --ckpt runs/prod_clean/model/model_final.npz \
        --held runs/prod_clean/held.hdf5 [--recalls 0.95]
Results recorded in benchmarks/RESULTS.md (round 4).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--held", required=True)
    ap.add_argument("--shapes", type=int, default=2)
    ap.add_argument("--recalls", type=float, nargs="+", default=[0.95])
    args = ap.parse_args()

    import h5py
    import jax
    import jax.numpy as jnp

    from threepu.inference import upsample_shape, upsample_point_cloud
    from threepu.io import load_checkpoint
    from threepu.losses import chamfer_loss
    from threepu.models import Net
    from threepu.ops import knn as knn_mod
    from threepu.ops.chamfer import self_nn_dist2

    print("backend:", jax.default_backend(), flush=True)
    net = Net(max_up_ratio=16, step_ratio=2, knn=32, growth_rate=12,
              dense_n=3, max_num_point=312, fm_knn=5)
    loaded, step = load_checkpoint(args.ckpt)
    params = loaded["params"]
    print(f"loaded {args.ckpt} (step {step})", flush=True)

    with h5py.File(args.held, "r") as f:
        n_avail = f["poisson_5000"].shape[0]
        shapes = [(f["poisson_5000"][i].astype(np.float32),
                   f["poisson_80000"][i].astype(np.float32))
                  for i in range(min(args.shapes, n_avail))]

    def cd(a, b):
        return float(chamfer_loss(jnp.asarray(a)[None],
                                  jnp.asarray(b)[None]))

    methods = [("exact", None)] + [("approx", r) for r in args.recalls]
    report = {"ckpt": args.ckpt, "step": int(step), "per_method": {}}
    outs = {}
    for method, recall in methods:
        tag = method if recall is None else f"{method}@{recall}"
        knn_mod.set_knn_method(method)
        if recall is not None:
            knn_mod.APPROX_RECALL_TARGET = recall
        # the selection method is trace-time state, not a jit cache
        # key: force a retrace per method
        upsample_point_cloud.clear_cache()
        rows = {"chamfer_vs_gt": [], "s_per_shape": []}
        for i, (inp, gt) in enumerate(shapes):
            t0 = time.time()
            _, up = upsample_shape(net, params, inp, 16, num_point=312,
                                   chunk=8)
            # first shape pays the compile: report per-shape timings
            rows["s_per_shape"].append(round(time.time() - t0, 3))
            rows["chamfer_vs_gt"].append(cd(up, gt))
            outs.setdefault(tag, []).append(up)
            print(f"{tag} shape {i}: chamfer "
                  f"{rows['chamfer_vs_gt'][-1]:.4e}"
                  f"  ({rows['s_per_shape'][-1]:.2f}s)", flush=True)
        rows["chamfer_mean"] = float(np.mean(rows["chamfer_vs_gt"]))
        report["per_method"][tag] = rows
    knn_mod.set_knn_method("exact")
    knn_mod.APPROX_RECALL_TARGET = 0.95
    upsample_point_cloud.clear_cache()

    # cross-method set difference on the same shapes, scaled by the
    # output's own NN spacing^2 (the "same point set" yardstick)
    sp = float(jnp.median(self_nn_dist2(jnp.asarray(outs["exact"][0])[None])))
    report["output_nn_spacing2"] = sp
    report["chamfer_between_methods"] = {
        tag: [cd(a, b) for a, b in zip(outs["exact"], outs[tag])]
        for tag in outs if tag != "exact"}

    print(json.dumps(report), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
