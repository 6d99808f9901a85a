"""Measure the ``restitch_groups`` knob at the headline config.

The round-3 stage attribution (RESULTS.md) puts the final exact-FPS
re-stitch at ~307 ms of the 1.48 s 16x shape — the largest non-cascade
term, and the cascade itself is measured at its structural optimum.
``restitch_groups=G`` replaces the 80k-pick sequential chain with
Morton-stratified hierarchical FPS over G spatial groups (the same
approximation >480k-pt merges use unconditionally; coverage within
~1-4% of exact at G=2..8, benchmarks/fps_quality.py).

This bench times the full pipeline at G in {1, 4, 8} (fresh surface
inputs, forced fetch) and quantifies the selection difference:

- Chamfer(out_G, out_exact) vs the output's own NN spacing — how far
  the approximate selection is from the exact one, at output scale;
- coverage radius over the input shape (max_n min_m |in_n - out_m|) —
  the FPS minimax objective both selections are trying to optimize.

Run on the TPU:  python benchmarks/restitch_bench.py [--reps 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from bench import surface
from threepu.models import Net
from threepu.inference import upsample_point_cloud
from threepu.ops.chamfer import nn_distance

N_SHAPE, RATIO, NUM_POINT = 5000, 16, 312
NUM_OUT = N_SHAPE * RATIO


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--groups", type=int, nargs="+", default=[1, 4, 8])
    args = ap.parse_args()

    print("backend:", jax.default_backend(), flush=True)
    net = Net(max_up_ratio=16, step_ratio=2, knn=32, growth_rate=12,
              dense_n=3, max_num_point=312, fm_knn=5)
    rng = np.random.default_rng(0)
    ex = jnp.asarray(rng.standard_normal((1, NUM_POINT, 3), ).astype(np.float32))
    gt = jnp.asarray(rng.standard_normal(
        (1, NUM_POINT * RATIO, 3)).astype(np.float32))
    params = net.init({"params": jax.random.PRNGKey(0),
                       "patch": jax.random.PRNGKey(1)},
                      ex, RATIO, gt, train=True)["params"]

    from threepu.losses import chamfer_loss

    @jax.jit
    def chamfer(a, b):
        return chamfer_loss(a[None], b[None])

    @jax.jit
    def coverage(inp, out):
        d, _, _, _ = nn_distance(inp[None], out[None])
        return jnp.sqrt(jnp.max(d))

    @jax.jit
    def spacing(out):
        # mean NN distance of the output cloud (scale for the chamfer)
        from threepu.ops.chamfer import self_nn_dist2
        return jnp.sqrt(jnp.mean(self_nn_dist2(out[None])))

    outs = {}
    for g in args.groups:
        def run(shape, g=g):
            out = upsample_point_cloud(net, params, shape, RATIO,
                                       NUM_POINT, NUM_OUT, chunk=8,
                                       restitch_groups=g)
            float(out.std())  # force fetch (axon memoization)
            return out

        t0 = time.time()
        out = run(jnp.asarray(surface(N_SHAPE, 0)))
        ttfs = time.time() - t0
        outs[g] = out
        times = []
        for i in range(args.reps):
            fresh = jnp.asarray(surface(N_SHAPE, i + 1))
            t0 = time.perf_counter()
            run(fresh)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"G={g}: {best:.3f} s/shape = {NUM_OUT/best/1e3:.1f}k pts/s"
              f"   (TTFS {ttfs:.1f} s)", flush=True)

    inp0 = jnp.asarray(surface(N_SHAPE, 0))
    sp = float(spacing(outs[args.groups[0]]))
    print(f"\noutput NN spacing: {sp:.2e}")
    for g in args.groups:
        cov = float(coverage(inp0, outs[g]))
        line = f"G={g}: coverage(input) {cov:.4e}"
        if g != 1 and 1 in outs:
            cd = float(chamfer(outs[g], outs[1]))
            line += f"   chamfer vs exact {cd:.3e} ({cd/sp**2:.3f} x sp^2)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
