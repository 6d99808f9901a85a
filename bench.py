"""Headline benchmark: upsampled points/sec/chip at 16x (5000 -> 80k).

The reference publishes no numbers (BASELINE.md); the baseline config is
its canonical eval (``Readme.md:31``): 5000-point shapes, 312-point
patches, 16x, patch_num_ratio 3 — i.e. the full ``test()`` pipeline of
``main.py:333-389`` end to end (seed FPS, 48-patch grouping, 4-level
cascade with re-patching/merging, final 80k FPS re-stitch) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is null: the reference repo ships no measured number to
normalise against (BASELINE.md — ``"published": {}``), and printing a
constant 1.0 would read as a measured ratio.
"""

import json
import sys
import time

import numpy as np


def surface(n: int, key: int) -> np.ndarray:
    """Modulated-sphere SURFACE point cloud (the family every training
    benchmark uses — ``threepu/data/synthetic.py``): kNN/FPS/duplicate
    statistics of real surface data — gaussian noise never triggers
    dedup or the outlier mask realistically (round-2 verdict)."""
    from threepu.data.synthetic import synthetic_surface

    r = np.random.default_rng(key)
    coef = r.standard_normal((4, 4)) * 0.12
    pts = synthetic_surface(n, coef, r)
    return pts / np.abs(pts).max()


def main() -> None:
    import jax
    import jax.numpy as jnp
    from threepu.models import Net
    from threepu.inference import (upsample_point_cloud,
                                   resolve_restitch_groups)

    n_shape, ratio, num_point = 5000, 16, 312
    num_out = n_shape * ratio

    net = Net(max_up_ratio=16, step_ratio=2, knn=32, growth_rate=12,
              dense_n=3, max_num_point=312, fm_knn=5)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(surface(n_shape, 0))
    gt = jnp.asarray(
        rng.standard_normal((1, num_point * ratio, 3)).astype(np.float32))
    ex = jnp.asarray(
        rng.standard_normal((1, num_point, 3)).astype(np.float32))
    params = net.init({"params": jax.random.PRNGKey(0),
                       "patch": jax.random.PRNGKey(1)},
                      ex, ratio, gt, train=True)["params"]

    def run(shape):
        out = upsample_point_cloud(net, params, shape, ratio, num_point,
                                   num_out, chunk=8)
        # force a fetch: under the axon TPU tunnel block_until_ready
        # returns early and identical-input re-runs are memoized
        float(out.std())
        return out

    t0 = time.time()
    out = run(xyz)  # compile + first run
    compile_s = time.time() - t0
    assert out.shape == (num_out, 3), out.shape
    assert bool(jnp.isfinite(out).all())

    times = []
    for i in range(3):
        fresh = jnp.asarray(surface(n_shape, i + 1))
        t0 = time.perf_counter()
        run(fresh)
        times.append(time.perf_counter() - t0)
    best = min(times)
    pps = num_out / best

    print(json.dumps({
        "metric": "upsampled_points_per_sec_per_chip_16x_5000to80k",
        "value": round(pps, 1),
        "unit": "points/sec",
        # no published reference number exists to normalise against
        # (BASELINE.md); null instead of a constant that looks measured
        "vs_baseline": None,
        "detail": {
            "wall_s_per_shape": round(best, 4),
            "compile_s": round(compile_s, 1),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            # round-4 default: G=8 hierarchical restitch at >= 16384
            # output points (quality-equal at trained weights,
            # benchmarks/restitch_quality.py)
            "restitch_groups": resolve_restitch_groups(None, num_out),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
