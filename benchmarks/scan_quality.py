"""Scan-config quality: Chamfer under input jitter (round-3 verdict #6).

The reference ships a second eval use case — noisy scans
(``Readme.md:37``: ``final_scan.pth``; jitter flags ``main.py:53-58``,
perturbation ``pc_utils.jitter_perturbation_point_cloud``).  Round 1-3
benchmarked this config for THROUGHPUT only (config 2 in RESULTS.md);
this bench produces the missing quality number: a trained model
upsampling jittered held-out shapes 16x, scored against the clean dense
ground truth — next to the same model's clean-input score, the
sparse-input baseline, and the config's wall-clock.

Two checkpoints can be compared (the reference ships separate
``final_poisson`` / ``final_scan`` weights): ``--ckpt`` (clean-trained)
and optionally ``--ckpt_scan`` (jitter-trained, ``train_production.py
--jitter``), mirroring the reference's pairing of weights to use case.

Run on the TPU:
    python benchmarks/scan_quality.py --ckpt runs/prod_clean/model/model_final.npz \
        --held runs/prod_clean/held.hdf5 [--ckpt_scan runs/prod_scan/model/model_final.npz]
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
    ap.add_argument("--ckpt_scan", default=None,
                    help="optional jitter-trained checkpoint")
    ap.add_argument("--held", required=True)
    ap.add_argument("--shapes", type=int, default=2)
    ap.add_argument("--jitter_sigma", type=float, default=0.0025)
    ap.add_argument("--jitter_max", type=float, default=0.005)
    args = ap.parse_args()

    import h5py
    import jax
    import jax.numpy as jnp

    from threepu.inference import upsample_shape
    from threepu.io import load_checkpoint
    from threepu.losses import chamfer_loss
    from threepu.models import Net

    print("backend:", jax.default_backend(), flush=True)
    net = Net(max_up_ratio=16, step_ratio=2, knn=32, growth_rate=12,
              dense_n=3, max_num_point=312, fm_knn=5)

    ckpts = {"clean-trained": args.ckpt}
    if args.ckpt_scan:
        ckpts["jitter-trained"] = args.ckpt_scan

    with h5py.File(args.held, "r") as f:
        n_avail = f["poisson_5000"].shape[0]
        shapes = [(f["poisson_5000"][i].astype(np.float32),
                   f["poisson_80000"][i].astype(np.float32))
                  for i in range(min(args.shapes, n_avail))]

    def cd(a, b):
        return float(chamfer_loss(jnp.asarray(a)[None],
                                  jnp.asarray(b)[None]))

    report = {"jitter_sigma": args.jitter_sigma,
              "jitter_max": args.jitter_max, "shapes": len(shapes),
              "models": {}}
    for label, path in ckpts.items():
        loaded, step = load_checkpoint(path)
        params = loaded["params"]
        rows = {"step": int(step), "clean": [], "jittered": [],
                "input_baseline": [], "jittered_s_per_shape": []}
        for i, (inp, gt) in enumerate(shapes):
            # restitch_groups=1 pinned: the recorded clean-model run
            # used the exact restitch; keep the clean/scan A/B at the
            # same selection semantics across rounds
            _, up = upsample_shape(net, params, inp, 16, num_point=312,
                                   chunk=8, restitch_groups=1)
            rows["clean"].append(cd(up, gt))
            t0 = time.time()
            # jitter=True applies the reference's perturbation to the
            # normalized input inside the pipeline (main.py:356-357)
            _, upj = upsample_shape(net, params, inp, 16, num_point=312,
                                    chunk=8, restitch_groups=1,
                                    jitter=True,
                                    jitter_sigma=args.jitter_sigma,
                                    jitter_max=args.jitter_max,
                                    seed=100 + i)
            rows["jittered_s_per_shape"].append(round(time.time() - t0, 3))
            rows["jittered"].append(cd(upj, gt))
            rows["input_baseline"].append(cd(inp, gt))
            print(f"{label} shape {i}: clean {rows['clean'][-1]:.3e}  "
                  f"jittered {rows['jittered'][-1]:.3e}  "
                  f"input {rows['input_baseline'][-1]:.3e}", flush=True)
        for k in ("clean", "jittered", "input_baseline"):
            rows[f"{k}_mean"] = float(np.mean(rows[k]))
        report["models"][label] = rows

    print(json.dumps(report), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
