"""A/B the train loop's loss-fetch cadence on the chip.

The reference reads the loss scalar every step for its running-mean
error log (``model.py:74-76``) — free on a local GPU, but through the
axon tunnel a per-step device fetch costs a round trip and capped the
real loop at ~17 steps/s against the 42.7 steps/s pipelined ceiling
(RESULTS.md round 2).  ``train_loop`` now buffers the device scalars
and fetches ONE stacked transfer every ``log_steps`` (bit-identical
error_log, replayed in order).

This measures both cadences in ONE process (session-to-session chip
variance is ~±20%, CLAUDE.md): ``log_steps=1`` reproduces the
fetch-per-step behavior, ``log_steps=50`` is the production default.

Usage: python benchmarks/train_fetch_bench.py [--steps 300]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_h5(path: str, n_shapes: int = 8) -> str:
    """Tiny reference-convention multi-resolution h5 (train_demo's
    surface family)."""
    import h5py
    from bench import surface

    resolutions = [5000, 10000, 20000, 40000, 80000]
    with h5py.File(path, "w") as f:
        for r in resolutions:
            data = np.stack([surface(r, 1000 + i)
                             for i in range(n_shapes)])
            f.create_dataset(f"poisson_{r}", data=data.astype(np.float32))
    return path


def run(cfg_kwargs, steps, label):
    from threepu.train.loop import TrainConfig, train_loop

    cfg = TrainConfig(**cfg_kwargs)
    t0 = time.time()
    _, error_log = train_loop(cfg, max_steps=steps)
    dt = time.time() - t0
    print(f"  {label}: {steps} steps in {dt:.1f}s = "
          f"{steps / dt:.1f} steps/s")
    return steps / dt, dict(error_log)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--workdir", default="/tmp/train_fetch_bench")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    h5 = os.path.join(args.workdir, "train_poisson_5000_10000_20000_"
                      "40000_80000.hdf5")
    if not os.path.exists(h5):
        make_h5(h5)

    base = dict(h5_data=h5, num_shape_point=5000, num_point=312,
                batch_size=16, up_ratio=16, stage_steps=15000,
                model_dir=os.path.join(args.workdir, "model"),
                ckpt_epochs=10_000)

    # warmup: compile the x2 train-step program (both cadences share it)
    print("warmup (compile)...")
    run(dict(base, log_steps=50), 60, "warmup")

    results = {}
    # Interleave to cancel chip drift; keep the best of two per
    # cadence.  Every timed run gets a DISTINCT seed: the tunnel
    # memoizes (executable, inputs), so repeating a byte-identical
    # trajectory could be served without executing (CLAUDE.md) and a
    # best-of over replays would measure the tunnel, not the chip.
    for trial in range(2):
        for cadence in (1, 50):
            sps, _ = run(dict(base, log_steps=cadence,
                              seed=100 + 10 * trial + cadence),
                         args.steps, f"log_steps={cadence} trial{trial}")
            key = f"log_steps_{cadence}"
            results[key] = max(results.get(key, 0.0), sps)

    # correctness, untimed, matched seed: the deferred path must replay
    # the identical running-mean updates
    _, log_1 = run(dict(base, log_steps=1, seed=7), 50, "parity c=1")
    _, log_50 = run(dict(base, log_steps=50, seed=7), 50, "parity c=50")
    for k in log_1:
        a, b = log_1[k], log_50[k]
        assert abs(a - b) < 1e-12, (k, a, b)
    print(json.dumps({
        "steps": args.steps,
        "steps_per_s_fetch_every_step": round(results["log_steps_1"], 1),
        "steps_per_s_deferred": round(results["log_steps_50"], 1),
        "speedup": round(results["log_steps_50"]
                         / results["log_steps_1"], 2),
        "error_log_identical": True,
    }))


if __name__ == "__main__":
    main()
