"""Quantify the fps_hierarchical approximation (ops/fps.py:116-153).

Above PALLAS_MAX_N (480k) points exact FPS is dispatched to
``fps_hierarchical``: contiguous groups sampled independently, picks
interleaved round-robin.  The production case is the final restitch of
a 50k-point shape at 16x (``main.py:379-380`` capability): ~2.4M merged
points -> 800k picks, i.e. 5 groups.  Exact FPS at that size is
intractable (it is *sequential* in m), so this A/B runs at the largest
exact-tractable size — one group of N points — and forces the
hierarchical path at 2/4/8 groups on the SAME cloud, bracketing the
production group count.

Metrics, per variant vs the exact selection:
  - coverage radius: max over cloud points of the distance to the
    nearest selected point (the minimax objective FPS greedily
    optimizes; the number that matters for restitch uniformity)
  - chamfer(sel, exact_sel): how far the selected SET drifts

Usage: python benchmarks/fps_quality.py  (axon TPU backend)
Results recorded in benchmarks/RESULTS.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def coverage_radius(cloud, sel, chunk=4096):
    """max_i min_j ||cloud_i - sel_j||  (streamed over cloud chunks)."""
    from threepu.ops.chamfer import nn_distance

    n = cloud.shape[0]
    pad = (-n) % chunk
    padded = jnp.pad(cloud, ((0, pad), (0, 0)))
    worst = 0.0
    for s in range(0, n + pad, chunk * 16):
        block = padded[s: s + chunk * 16]
        d, _, _, _ = nn_distance(block[None], sel[None])
        valid = min(chunk * 16, max(0, n - s))
        if valid > 0:
            worst = max(worst, float(jnp.max(d[0, :valid])))
    return float(np.sqrt(worst))


def main():
    from threepu.ops.fps import fps_hierarchical
    from threepu.ops.fps_pallas import fps_pallas
    from threepu.ops.chamfer import nn_distance

    print("backend:", jax.default_backend())
    if jax.default_backend() != "tpu":
        print("ERROR: needs the TPU backend (axon)")
        return 2

    n, m = 400_000, 100_000
    rng = np.random.default_rng(0)
    # patch-merge-like cloud: clustered, not uniform (the real merged
    # cloud is 16 nearly-coincident upsampled copies per seed region)
    centers = rng.standard_normal((n // 16, 3)).astype(np.float32)
    cloud = (centers[:, None, :]
             + rng.standard_normal((n // 16, 16, 3)).astype(np.float32)
             * 0.02).reshape(n, 3)
    rng.shuffle(cloud)  # contiguous groups must not align with clusters
    cloud_j = jnp.asarray(cloud)

    t0 = time.time()
    idx_exact = np.asarray(fps_pallas(cloud_j[None], m))[0]
    t_exact = time.time() - t0
    sel_exact = jnp.asarray(cloud[idx_exact])
    cov_exact = coverage_radius(cloud_j, sel_exact)
    print(f"exact    1 group : coverage={cov_exact:.4f}  "
          f"({t_exact:.1f}s)", flush=True)

    for groups in (2, 4, 8):
        for sort in ("none", "morton"):
            gmax = n // groups
            t0 = time.time()
            idx_h = np.asarray(fps_hierarchical(
                cloud_j[None], m, group_max=gmax, sort=sort))[0]
            t_h = time.time() - t0
            sel_h = jnp.asarray(cloud[idx_h])
            cov = coverage_radius(cloud_j, sel_h)
            d1, _, d2, _ = nn_distance(sel_h[None], sel_exact[None])
            cd = float(jnp.mean(d1) + jnp.mean(d2))
            print(f"hier {groups:2d} groups {sort:6s}: "
                  f"coverage={cov:.4f} "
                  f"({cov / cov_exact - 1:+.1%} vs exact)  "
                  f"chamfer_to_exact={cd:.2e}  ({t_h:.1f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
