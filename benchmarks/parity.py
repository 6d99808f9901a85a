"""Chamfer-distance parity harness.

SURVEY.md §6: with no published numbers, the parity target is
Chamfer-distance agreement with the reference's own outputs when run
from the same checkpoint (``final_poisson.pth``) on the same shapes.

Usage:
  # score our outputs against reference outputs (directory of .ply/.xyz)
  python benchmarks/parity.py --ours out/ --reference ref_out/

  # upsample with an imported .pth and score against reference outputs
  python benchmarks/parity.py --ckpt final_poisson.pth \
      --test_data "data/*.xyz" --num_shape_point 5000 --reference ref_out/

Chamfer is computed host-side with the native C++ kernel
(threepu/native), so no device round trip is needed for scoring.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def chamfer(a: np.ndarray, b: np.ndarray) -> float:
    try:
        from threepu.native import chamfer_cpu
        return chamfer_cpu(a, b)
    except Exception:
        from tests.oracles import nn_distance_oracle  # fallback: slow
        d1, _, d2, _ = nn_distance_oracle(a[:, :3], b[:, :3])
        return float(d1.mean() + d2.mean())


def load_any(path: str) -> np.ndarray:
    from threepu.io import load
    return load(path)[:, :3].astype(np.float32)


def score_dirs(ours: str, reference: str) -> dict:
    ref_files = {os.path.splitext(os.path.basename(p))[0]: p
                 for p in glob(os.path.join(reference, "**", "*.*"),
                               recursive=True)
                 if p.endswith((".ply", ".xyz"))}
    rows = {}
    for path in sorted(glob(os.path.join(ours, "**", "*.*"),
                            recursive=True)):
        if not path.endswith((".ply", ".xyz")):
            continue
        stem = os.path.splitext(os.path.basename(path))[0]
        if stem.endswith("_input") or stem not in ref_files:
            continue
        rows[stem] = chamfer(load_any(path), load_any(ref_files[stem]))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", help="directory of our outputs")
    ap.add_argument("--reference", required=True,
                    help="directory of reference outputs")
    ap.add_argument("--ckpt", help="run inference first with this ckpt")
    ap.add_argument("--test_data", help="input shapes glob (with --ckpt)")
    ap.add_argument("--num_shape_point", type=int, default=5000)
    ap.add_argument("--up_ratio", type=int, default=16)
    ap.add_argument("--out_dir", default="./parity_out")
    args = ap.parse_args()

    if not args.ours and not args.ckpt:
        ap.error("one of --ours or --ckpt is required (see module "
                 "docstring for the two usage modes)")
    if args.ckpt and not args.test_data:
        ap.error("--ckpt requires --test_data (input shapes to upsample)")

    ours = args.ours
    if args.ckpt:
        from threepu.cli import main as cli_main
        cli_main(["--phase", "test", "--ckpt", args.ckpt,
                  "--num_shape_point", str(args.num_shape_point),
                  "--num_point", "312",
                  "--up_ratio", str(args.up_ratio),
                  "--test_data", args.test_data,
                  "--result_dir", args.out_dir])
        ours = args.out_dir

    rows = score_dirs(ours, args.reference)
    summary = {"per_shape_chamfer": rows,
               "mean_chamfer": float(np.mean(list(rows.values())))
               if rows else None,
               "num_shapes": len(rows)}
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
