"""Measure exact-selection variants at the cascade's dominant cost.

Round-4 finding (``eval_gap.py``, RESULTS.md): the eval pipeline is
SELECTION-bound — ``lax.top_k`` k=33 over the (320,312,312) feature
distance matrix costs ~14.9 ms per conv (vs 6.4 ms for the conv's whole
MXU chain), and ``approx_min_k`` runs the same site at 9.9 ms by
reducing per-partition first.  ``ops/knn.py::_split_select`` applies
the same two-stage structure EXACTLY (bit-identical indices and
tie-breaking, ``tests/test_ops.py::TestSplitSelect``): per-contiguous-
split top_k -> merge s*k survivors -> top_k.

This bench answers, on chip and in one process:
1. micro: direct top_k vs split s in {2,4,6,8} vs full sort vs approx
   at the conv site;
2. in-context: the fused conv at its in-level operating point and the
   full x16 chunk, splits off vs on;
3. end-to-end: the 16x headline (5000 -> 80k, fresh surface inputs,
   G=8 default restitch) with the best split setting — the round-4
   headline candidate.

Run on the TPU:  python benchmarks/select_bench.py [--reps 3]
                 [--splits 4] [--skip_e2e]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from cascade_decomp import P_TOP, N_SUB, N, C_FEAT, K, G, f32, timeit, chain
from threepu.models import Net
from threepu.models.layers import DenseEdgeConv
from threepu.ops import knn as knn_mod

B = P_TOP * N_SUB  # 320


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--splits", type=int, default=0,
                    help="split count for the in-context + e2e A/B "
                         "(0: pick the micro winner)")
    ap.add_argument("--skip_e2e", action="store_true")
    args = ap.parse_args()
    reps = args.reps

    print("backend:", jax.default_backend(), flush=True)
    results = {}

    def bench(tag, body, make_x, n_chain=10, r=None):
        many, n = chain(body, reps=n_chain)
        results[tag] = timeit(many, make_x, r or reps,
                              f"{tag} [chain/{n}]", chained=n) * 1e3
        return results[tag]

    # ---- 1. micro: the (320,312,312) k=33 selection site -------------
    mk = lambda: (f32(B, N, N),)
    bench("top_k direct", lambda d: jax.lax.top_k(-d, K + 1)[1], mk)
    for s in (2, 4, 6, 8):
        bench(f"split s={s}",
              lambda d, s=s: knn_mod._split_select(d, K + 1, s)[1], mk)
    bench("sort full", lambda d: knn_mod._sort_select(d, K + 1)[1], mk)
    bench("approx .95",
          lambda d: jax.lax.approx_min_k(d, K + 1,
                                         recall_target=0.95)[1], mk)

    micro = {k: v for k, v in results.items() if k.startswith("split")}
    best_s = args.splits or int(min(micro, key=micro.get).split("=")[1])
    print(f"micro winner: s={best_s}", flush=True)

    # ---- 2. in-context: conv + full chunk, splits off vs on ----------
    dup0 = jnp.zeros((B, N), bool)
    conv = DenseEdgeConv(growth_rate=G, n=3, k=K, fused=True)
    cparams = conv.init({"params": jax.random.PRNGKey(3)},
                        f32(B, N, C_FEAT))
    net = Net(max_up_ratio=16, step_ratio=2, knn=K, growth_rate=G,
              dense_n=3, max_num_point=N, fm_knn=5)
    params = net.init({"params": jax.random.PRNGKey(0),
                       "patch": jax.random.PRNGKey(1)},
                      f32(1, N, 3), 16, f32(1, N * 16, 3),
                      train=True)["params"]

    for s in (0, best_s):
        knn_mod.set_exact_splits(s)
        bench(f"conv in-level (splits={s})",
              lambda x: conv.apply(cparams, x, dup_mask=dup0)[0],
              lambda: (f32(B, N, C_FEAT),), n_chain=20)
        bench(f"CHUNK x16 (splits={s})",
              lambda c: net.apply({"params": params}, c, 16,
                                  train=False),
              lambda: (f32(8, N, 3),), n_chain=3, r=max(2, reps - 1))
    knn_mod.set_exact_splits(0)

    # ---- 3. end-to-end headline A/B -----------------------------------
    if not args.skip_e2e:
        from bench import surface
        from threepu.inference import upsample_point_cloud

        n_shape, ratio, num_point = 5000, 16, 312
        num_out = n_shape * ratio

        def run(shape):
            out = upsample_point_cloud(net, params, shape, ratio,
                                       num_point, num_out, chunk=8)
            float(out.std())
            return out

        for s in (0, best_s):
            knn_mod.set_exact_splits(s)
            upsample_point_cloud.clear_cache()  # force retrace: the
            # split setting is trace-time state, not a jit cache key
            t0 = time.time()
            run(jnp.asarray(surface(n_shape, 0)))
            compile_s = time.time() - t0
            ts = []
            for i in range(3):
                fresh = jnp.asarray(surface(n_shape, i + 1))
                t0 = time.perf_counter()
                run(fresh)
                ts.append(time.perf_counter() - t0)
            best = min(ts)
            results[f"e2e s/shape (splits={s})"] = best
            results[f"e2e TTFS (splits={s})"] = compile_s
            print(f"e2e splits={s}: {best:.3f} s/shape "
                  f"({num_out / best / 1e3:.1f}k pts/s), "
                  f"compile {compile_s:.1f}s", flush=True)
        knn_mod.set_exact_splits(0)

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
