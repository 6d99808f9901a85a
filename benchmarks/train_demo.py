"""End-to-end training demonstration on the real chip.

The unit suite exercises the train loop on CPU with tiny nets; this
artifact runs the REAL production configuration (reference defaults:
batch 16, 312-pt patches, knn 32, growth 12, dense_n 3, x16 curriculum
— ``main.py:28-52``) through every curriculum transition on TPU
hardware, on a synthesized multi-resolution dataset at reference scale
(5000..80000 points, the sketchfab convention ``Readme.md:57``), and
records per-ratio loss trajectories + steps/sec.

The curriculum's stage length is compressed (``--stage_steps``; default
120, reference 15000) so a few hundred steps visit ratios 2, 4, 8, 16
and both combined phases — everything else is the production code path:
HBM-resident dataset with jit-compiled sampling+augmentation, donated
train step, running-mean error log, epoch checkpointing.

Usage: python benchmarks/train_demo.py [--steps 620] [--stage_steps 120]
Results recorded in benchmarks/RESULTS.md.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def synth_dataset(path: str, n_shapes: int = 20, seed: int = 7) -> str:
    """Reference-scale multi-resolution shapes with learnable structure
    (delegates to the library generator, ``threepu/data/synthetic.py``).
    The resolutions and tag are parsed from ``path``'s filename — the
    same convention ``load_h5_data`` reads — so the file content always
    matches its name (e.g. held-out sets named ``held_...``)."""
    import re

    from threepu.data.synthetic import (DEFAULT_RESOLUTIONS,
                                        write_synthetic_h5)

    base = os.path.basename(path)
    resolutions = sorted(int(x) for x in re.findall(r"\d+", base[:-5]))
    tags = re.findall(r"_([A-Za-z]+)_", base)
    # names without the convention (e.g. "held.hdf5") get the defaults
    return write_synthetic_h5(os.path.dirname(path) or ".",
                              n_shapes=n_shapes, seed=seed,
                              resolutions=resolutions or
                              DEFAULT_RESOLUTIONS,
                              tag=tags[-1] if tags else "poisson",
                              filename=base)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=620)
    ap.add_argument("--stage_steps", type=int, default=120)
    ap.add_argument("--shapes", type=int, default=20)
    args = ap.parse_args()

    import jax
    print("backend:", jax.default_backend(), flush=True)

    from threepu.train.loop import TrainConfig, train_loop

    tmp = tempfile.mkdtemp()
    h5 = synth_dataset(os.path.join(
        tmp, "train_poisson_5000_poisson_10000_poisson_20000_"
        "poisson_40000_poisson_80000.hdf5"), n_shapes=args.shapes)

    cfg = TrainConfig(
        h5_data=h5, num_shape_point=5000, num_point=312,
        stage_steps=args.stage_steps, model_dir=os.path.join(tmp, "model"),
        # 5-step trajectory granularity (every log step runs the
        # with_pred program variant, so keep it off the every-step path)
        log_steps=5)
    os.makedirs(cfg.model_dir, exist_ok=True)

    losses = {}

    def log_fn(step, ratio, loss, state, batch, **kw):
        losses.setdefault(ratio, []).append((step, loss))

    t0 = time.time()
    state, error_log = train_loop(cfg, max_steps=args.steps, log_fn=log_fn)
    wall = time.time() - t0

    report = {"steps": args.steps, "wall_s": round(wall, 1),
              "steps_per_sec_incl_compiles": round(args.steps / wall, 2)}
    for ratio, tr in sorted(losses.items()):
        arr = np.asarray([l for _, l in tr])
        head = float(np.mean(arr[: max(1, len(arr) // 5)]))
        tail = float(np.mean(arr[-max(1, len(arr) // 5):]))
        report[f"x{ratio}"] = {
            "steps": len(arr), "first_fifth_loss": round(head, 5),
            "last_fifth_loss": round(tail, 5),
            "improved": bool(tail < head)}
    print(json.dumps(report), flush=True)
    ok = all(report[k]["improved"] for k in report if k.startswith("x"))
    print("TRAIN DEMO:", "OK" if ok else "LOSS NOT DECREASING", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
