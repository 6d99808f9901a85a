"""Settle the ``restitch_groups`` default with a trained-weights quality
number (round-3 verdict #3).

Round 3 measured the throughput side on chip (``restitch_bench``, one
process): G=8 Morton-stratified hierarchical restitch = 1.358 s/shape
(58.9k pts/s) at TTFS 73.8 s vs exact G=1 at 1.458 s/shape, TTFS 412.9 s
— with input-coverage identical to 4 digits and Chamfer-to-exact 0.43x
the output NN spacing^2.  What was missing is the knn-ablation-style
evidence that settled the exact-vs-approx kNN default: does the
approximation move the QUALITY metric at trained weights?

This bench loads a production-trained checkpoint, 16x-upsamples held-out
shapes under each G, and reports Chamfer vs the dense ground truth plus
s/shape, side by side.  Decision rule, mirroring the kNN ablation: flip
the default only if G>1 is faster AND the held-out Chamfer is
indistinguishable from G=1 (within the spread across held-out shapes).

Run on the TPU:
    python benchmarks/restitch_quality.py --ckpt runs/prod_clean/model/model_final.npz \
        --held runs/prod_clean/held.hdf5 [--groups 1 8]
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
    ap.add_argument("--groups", type=int, nargs="+", default=[1, 8])
    args = ap.parse_args()

    import h5py
    import jax
    import jax.numpy as jnp

    from threepu.inference import upsample_shape
    from threepu.io import load_checkpoint
    from threepu.losses import chamfer_loss
    from threepu.models import Net
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

    report = {"ckpt": args.ckpt, "step": int(step), "per_g": {}}
    outs = {}
    for g in args.groups:
        rows = {"chamfer_vs_gt": [], "s_per_shape": []}
        for i, (inp, gt) in enumerate(shapes):
            t0 = time.time()
            _, up = upsample_shape(net, params, inp, 16, num_point=312,
                                   chunk=8, restitch_groups=g)
            # steady-state-ish wall: first shape pays the compile, so
            # report per-shape timings individually
            rows["s_per_shape"].append(round(time.time() - t0, 3))
            rows["chamfer_vs_gt"].append(cd(up, gt))
            outs.setdefault(g, []).append(up)
            print(f"G={g} shape {i}: chamfer {rows['chamfer_vs_gt'][-1]:.4e}"
                  f"  ({rows['s_per_shape'][-1]:.2f}s)", flush=True)
        rows["chamfer_mean"] = float(np.mean(rows["chamfer_vs_gt"]))
        report["per_g"][str(g)] = rows

    # cross-G set difference on the same shape, scaled by NN spacing^2
    if len(args.groups) > 1:
        g0 = args.groups[0]
        sp = float(jnp.median(self_nn_dist2(
            jnp.asarray(outs[g0][0])[None])))
        report["output_nn_spacing2"] = sp
        report["chamfer_between_g"] = {
            str(g): [cd(a, b) for a, b in zip(outs[g0], outs[g])]
            for g in args.groups[1:]}

    print(json.dumps(report), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
