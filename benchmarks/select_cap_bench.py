"""Price the k-cap on the Pallas exact-selection dispatch, end to end.

``select_pallas_bench.py`` measured the UNcapped dispatch (every exact
selection through the kernel) at 1.063 s/shape vs 1.356 for plain
top_k.  The shipped default adds ``knn_mod._PALLAS_SELECT_MAX_K = 64``
— conv/fm sites keep the kernel, the k=312 seed-grouping and sub-patch
extraction sites keep ``lax.top_k`` (their 312-sweep unroll was the
unmeasured compile/runtime risk, and the train re-patch shares them).
This bench prices that choice on the eval side: the 16x headline with
cap 64 vs cap 512 (uncapped in practice) in one process, fresh shapes,
forced fetch, plus the per-variant compile.

Run on the TPU:  python benchmarks/select_cap_bench.py [--reps 2]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from threepu.inference import upsample_point_cloud
from threepu.models import Net
from threepu.ops import knn as knn_mod


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    net = Net(max_up_ratio=16, step_ratio=2, knn=32, growth_rate=12,
              dense_n=3, max_num_point=312, fm_knn=5)
    rng = np.random.default_rng(11)

    def fresh_shape():
        x = rng.standard_normal((5000, 3)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        return x + 0.05 * rng.standard_normal((5000, 3)).astype(np.float32)

    params = net.init({"params": jax.random.PRNGKey(1),
                       "patch": jax.random.PRNGKey(2)},
                      jnp.zeros((1, 312, 3)), 16,
                      jnp.zeros((1, 312 * 16, 3)), train=True)["params"]

    results = {}
    outs = {}
    for cap in (64, 512):
        knn_mod._PALLAS_SELECT_MAX_K = cap
        upsample_point_cloud.clear_cache()
        t0 = time.time()
        out = upsample_point_cloud(net, params, jnp.asarray(fresh_shape()),
                                   16, num_point=312, num_out=80000,
                                   chunk=8)
        first = float(np.asarray(out).std())
        compile_s = time.time() - t0
        walls = []
        for _ in range(args.reps):
            x = jnp.asarray(fresh_shape())
            t0 = time.time()
            out = upsample_point_cloud(net, params, x, 16,
                                       num_point=312, num_out=80000,
                                       chunk=8)
            _ = float(np.asarray(out).std())
            walls.append(time.time() - t0)
        sec = min(walls)
        results[f"cap{cap}"] = {"s_per_shape": round(sec, 3),
                                "pts_per_sec": round(80000 / sec, 1),
                                "compile_s": round(compile_s, 1)}
        outs[cap] = np.asarray(out)
        print(f"cap {cap}: {sec:.3f} s/shape ({80000 / sec / 1e3:.1f}k "
              f"pts/s), compile {compile_s:.1f}s (sanity {first:.4f})",
              flush=True)
    knn_mod._PALLAS_SELECT_MAX_K = 64

    # same shape through both caps must be bit-identical (exact kernel)
    x = jnp.asarray(fresh_shape())
    per_cap = []
    for cap in (64, 512):
        knn_mod._PALLAS_SELECT_MAX_K = cap
        upsample_point_cloud.clear_cache()
        per_cap.append(np.asarray(upsample_point_cloud(
            net, params, x, 16, num_point=312, num_out=80000, chunk=8)))
    knn_mod._PALLAS_SELECT_MAX_K = 64
    upsample_point_cloud.clear_cache()
    results["bit_identical"] = bool((per_cap[0] == per_cap[1]).all())
    print("outputs bit-identical across caps:",
          results["bit_identical"], flush=True)
    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
