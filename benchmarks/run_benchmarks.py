"""Benchmark suite over the five BASELINE.json configs.

The reference publishes no numbers (BASELINE.md), so these measure our
own implementation on the canonical configs; ``bench.py`` at the repo
root is the single-line headline wrapper around config 1.

Usage: python benchmarks/run_benchmarks.py [--configs 1 2 ...]
(results print as JSON, one line per config plus a final summary)
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


def _fresh_shape(rng, n):
    """Modulated-sphere surface (bench.surface); the key comes from the
    caller's rng stream so every call sees a fresh shape."""
    import jax.numpy as jnp
    from bench import surface
    return jnp.asarray(surface(n, int(rng.integers(1 << 31))))


def _full_net_params(seed=0):
    import jax
    import jax.numpy as jnp
    from threepu.models import Net

    net = Net(max_up_ratio=16, step_ratio=2, knn=32, growth_rate=12,
              dense_n=3, max_num_point=312, fm_knn=5)
    rng = np.random.default_rng(seed)
    ex = jnp.asarray(rng.standard_normal((1, 312, 3)).astype(np.float32))
    gt = jnp.asarray(
        rng.standard_normal((1, 312 * 16, 3)).astype(np.float32))
    params = net.init({"params": jax.random.PRNGKey(0),
                       "patch": jax.random.PRNGKey(1)},
                      ex, 16, gt, train=True)["params"]
    return net, params


def _timed_upsample(net, params, shape, ratio, num_out, chunk=8,
                    repeats=3):
    """Steady-state seconds per shape (fresh inputs each run; fetch
    forces completion — see utils/profiling.py)."""
    from threepu.inference import upsample_point_cloud

    float(upsample_point_cloud(net, params, shape, ratio, 312, num_out,
                               chunk=chunk).std())  # compile
    rng = np.random.default_rng(123)
    times = []
    for _ in range(repeats):
        s = _fresh_shape(rng, shape.shape[0])
        t0 = time.perf_counter()
        out = upsample_point_cloud(net, params, s, ratio, 312, num_out,
                                   chunk=chunk)
        float(out.std())
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_1_poisson16x():
    """Sketchfab-style 16x: 5000 -> 80k, 312-pt patches."""
    net, params = _full_net_params()
    shape = _fresh_shape(np.random.default_rng(0), 5000)
    sec = _timed_upsample(net, params, shape, 16, 80000)
    return {"config": "16x 5000->80k", "wall_s": sec,
            "points_per_sec": 80000 / sec}


def bench_2_scan16x_jitter():
    """Scan-style: jittered input, 16x with merge/re-stitch."""
    import jax.numpy as jnp
    from threepu.inference import upsample_shape

    net, params = _full_net_params()
    rng = np.random.default_rng(1)
    pts = np.asarray(_fresh_shape(rng, 5000))
    upsample_shape(net, params, pts, 16, num_point=312, jitter=True,
                   chunk=8)  # compile
    times = []
    for _ in range(2):
        fresh = np.asarray(_fresh_shape(rng, 5000))
        t0 = time.perf_counter()
        _, up = upsample_shape(net, params, fresh, 16, num_point=312,
                               jitter=True, chunk=8)
        times.append(time.perf_counter() - t0)
    sec = min(times)
    return {"config": "scan 16x jittered", "wall_s": sec,
            "points_per_sec": up.shape[0] / sec}


def bench_3_train():
    """Training step throughput: batch 16 x 312-pt patches, ratio 16."""
    import jax
    import jax.numpy as jnp
    from threepu.train.model import (create_train_state, make_optimizer,
                                     train_step)

    net, _ = _full_net_params()
    rng = np.random.default_rng(2)
    inp = jnp.asarray(
        rng.standard_normal((16, 312, 3)).astype(np.float32))
    gt = jnp.asarray(
        rng.standard_normal((16, 312 * 16, 3)).astype(np.float32))
    tx = make_optimizer(5e-4)
    state = create_train_state(net, jax.random.PRNGKey(0), inp, gt, 16,
                               tx=tx)
    key = jax.random.PRNGKey(1)
    for i in range(3):
        state, cd = train_step(net, tx, state, jax.random.PRNGKey(i),
                               inp, gt, 16)
    float(cd)  # compile + sync
    # pipelined timing: training enqueues steps back-to-back (the loop
    # never fetches per step), so time N async steps + one final fetch.
    # Per-call blocking timing would measure the axon tunnel round trip
    # (~60 ms), not the step.
    inp2 = jnp.asarray(
        rng.standard_normal(inp.shape).astype(np.float32))
    gt2 = jnp.asarray(rng.standard_normal(gt.shape).astype(np.float32))
    steps = 30
    t0 = time.perf_counter()
    for i in range(steps):
        state, cd = train_step(net, tx, state, jax.random.PRNGKey(100 + i),
                               inp2, gt2, 16)
    float(cd)
    sec = (time.perf_counter() - t0) / steps
    return {"config": "train step b16 x16", "wall_s": sec,
            "steps_per_sec": 1.0 / sec,
            "patches_per_sec": 16 / sec}


def bench_4_large_shape():
    """50k-point input at 4x and 16x."""
    net, params = _full_net_params()
    shape = _fresh_shape(np.random.default_rng(3), 50000)
    out = {}
    for ratio in (4, 16):
        sec = _timed_upsample(net, params, shape, ratio, 50000 * ratio,
                              chunk=8, repeats=2)
        out[f"x{ratio}"] = {"wall_s": sec,
                            "points_per_sec": 50000 * ratio / sec}
    return {"config": "large shape 50k", **out}


def bench_5_dataset_throughput(n_shapes=8):
    """Batched multi-shape 16x inference throughput."""
    net, params = _full_net_params()
    rng = np.random.default_rng(4)
    shapes = [_fresh_shape(rng, 5000) for _ in range(n_shapes)]
    _timed_upsample(net, params, shapes[0], 16, 80000)  # compile
    from threepu.inference import upsample_point_cloud
    t0 = time.perf_counter()
    for s in shapes:
        float(upsample_point_cloud(net, params, s, 16, 312, 80000,
                                   chunk=8).std())
    sec = time.perf_counter() - t0
    return {"config": f"dataset {n_shapes} shapes 16x", "wall_s": sec,
            "shapes_per_sec": n_shapes / sec,
            "points_per_sec": n_shapes * 80000 / sec}


BENCHES = {1: bench_1_poisson16x, 2: bench_2_scan16x_jitter,
           3: bench_3_train, 4: bench_4_large_shape,
           5: bench_5_dataset_throughput}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, nargs="*",
                    default=sorted(BENCHES))
    args = ap.parse_args()
    import jax
    results = {"backend": jax.default_backend(),
               "device": str(jax.devices()[0])}
    for c in args.configs:
        results[str(c)] = BENCHES[c]()
        print(json.dumps({str(c): results[str(c)]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
