"""Single-process end-to-end A/B of the fused edge-conv chain layouts
on the 16x headline pipeline (5000 -> 80k, bench.py config).

Both layouts compile and run in ONE process with fresh surface inputs
per timing run (CLAUDE.md: chip throughput varies ~±20% between
sessions — a variant must be compared against a baseline measured in
the same process).  Also cross-checks the two layouts' outputs on an
identical input.

Run on the TPU:  python benchmarks/e2e_layout_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import surface
import threepu.models.layers as lm
from threepu.models import Net
from threepu.inference import upsample_point_cloud
from threepu.ops.chamfer import nn_distance


def main():
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

    results = {}
    outs = {}
    for layout in ("lanes", "transposed"):
        lm.FUSED_LAYOUT = layout
        # upsample_point_cloud is a module-level jax.jit whose cache key
        # does not include the layout global — force a retrace so the
        # second layout actually compiles its own program
        upsample_point_cloud.clear_cache()

        def run(shape):
            out = upsample_point_cloud(net, params, shape, ratio,
                                       num_point, num_out, chunk=8)
            float(out.std())   # force a fetch through the tunnel
            return out

        t0 = time.time()
        out = run(xyz)
        ttfs = time.time() - t0
        assert out.shape == (num_out, 3), out.shape
        assert bool(jnp.isfinite(out).all())
        outs[layout] = out
        times = []
        for i in range(3):
            fresh = jnp.asarray(surface(n_shape, i + 1))
            t0 = time.perf_counter()
            run(fresh)
            times.append(time.perf_counter() - t0)
        best = min(times)
        results[layout] = (best, ttfs)
        print(f"[{layout}] {best:.3f} s/shape = {num_out/best/1e3:.1f}k "
              f"pts/s (ttfs {ttfs:.1f} s)", flush=True)

    # set-level agreement on the identical input (distinct XLA programs:
    # FMA/fusion rounding can flip near-tie selections, so compare the
    # Chamfer between the two outputs against the nn spacing scale)
    a, b = outs["lanes"][None], outs["transposed"][None]
    d_ab, _, d_ba, _ = nn_distance(a, b)
    cd = float(d_ab.mean() + d_ba.mean())
    d_self, _, _, _ = nn_distance(a, a[:, ::2])
    print(f"chamfer(lanes, transposed) = {cd:.3e} "
          f"(nn-spacing scale {float(d_self.mean()):.3e})", flush=True)
    t_l, t_t = results["lanes"][0], results["transposed"][0]
    print(f"transposed speedup: {t_l / t_t:.2f}x", flush=True)


if __name__ == "__main__":
    main()
