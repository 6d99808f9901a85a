"""Measure the Pallas exact-selection kernel at the conv site.

Follow-up to ``select_bench.py`` (which measured the composed exact
reformulations OUT: split-top-k 3x slower, sort +13%, only the
semantics-changing ``approx_min_k`` beats ``lax.top_k``).
``ops/select_pallas.py`` attacks the same site with k
lexicographic-min extraction sweeps over a VMEM-resident block —
bit-identical selection (``tests/test_ops.py::TestSelectPallas``) at
~k*M*N*6 VPU flops instead of a full variadic sort.

On chip, one process:
1. bit-identity vs lax.top_k on tie-heavy inputs (the dedup penalty
   pattern) — a wrong kernel must fail loudly before any timing;
2. micro: top_k vs select_pallas at the conv site (320,312,312) k=33,
   plus the smaller per-level batches (8/80/160) to price kernel
   instances (each distinct B is a separate axon remote compile);
3. in-context: knn_group feats / fused conv / full x16 chunk with the
   dispatch knob off vs on;
4. end-to-end: the 16x headline (G=8 default restitch) off vs on.

Run on the TPU:  python benchmarks/select_pallas_bench.py [--reps 3]
                 [--skip_e2e] [--skip_context]
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
from threepu.ops.select_pallas import select_pallas

B = P_TOP * N_SUB  # 320


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip_e2e", action="store_true")
    ap.add_argument("--skip_context", action="store_true")
    args = ap.parse_args()
    reps = args.reps

    print("backend:", jax.default_backend(), flush=True)
    results = {}

    def bench(tag, body, make_x, n_chain=10, r=None):
        many, n = chain(body, reps=n_chain)
        results[tag] = timeit(many, make_x, r or reps,
                              f"{tag} [chain/{n}]", chained=n) * 1e3
        return results[tag]

    # ---- 1. on-chip bit-identity on tie-heavy inputs ------------------
    rng = np.random.default_rng(0)
    d_np = rng.integers(0, 50, (B, N, N)).astype(np.float32)
    d_np[..., :64] = 1e30
    d = jnp.asarray(d_np)
    ref_v, ref_i = jax.jit(lambda x: jax.lax.top_k(-x, K + 1))(d)
    v, i = jax.jit(lambda x: select_pallas(x, K + 1))(d)
    assert (np.asarray(i) == np.asarray(ref_i)).all(), "IDX MISMATCH"
    assert (np.asarray(v) == np.asarray(-ref_v)).all(), "VAL MISMATCH"
    print("bit-identity on chip: OK (ties + penalty block)", flush=True)

    # ---- 2. micro ------------------------------------------------------
    mk = lambda: (f32(B, N, N),)
    bench("top_k direct", lambda x: jax.lax.top_k(-x, K + 1)[1], mk)
    bench("select_pallas", lambda x: select_pallas(x, K + 1)[1], mk)
    # per-level batch sizes: price the extra kernel instances
    for b_l in (8, 80, 160):
        bench(f"select_pallas B={b_l}",
              lambda x: select_pallas(x, K + 1)[1],
              lambda b_l=b_l: (f32(b_l, N, N),), n_chain=10)
        bench(f"top_k B={b_l}",
              lambda x: jax.lax.top_k(-x, K + 1)[1],
              lambda b_l=b_l: (f32(b_l, N, N),), n_chain=10)

    # ---- 3. in-context -------------------------------------------------
    if not args.skip_context:
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

        for on in (False, True):
            knn_mod.set_exact_select_pallas(on)
            bench(f"knn feats (kernel={on})",
                  lambda x: knn_mod.knn_group(
                      x, x, K + 1, unique=True, dup_mask=dup0,
                      with_neighbors=False).idx,
                  lambda: (f32(B, N, C_FEAT),), n_chain=20)
            bench(f"conv in-level (kernel={on})",
                  lambda x: conv.apply(cparams, x, dup_mask=dup0)[0],
                  lambda: (f32(B, N, C_FEAT),), n_chain=20)
            bench(f"CHUNK x16 (kernel={on})",
                  lambda c: net.apply({"params": params}, c, 16,
                                      train=False),
                  lambda: (f32(8, N, 3),), n_chain=3, r=max(2, reps - 1))
        knn_mod.set_exact_select_pallas(False)

    # ---- 4. end-to-end headline A/B ------------------------------------
    if not args.skip_e2e:
        from bench import surface
        from threepu.inference import upsample_point_cloud

        net = Net(max_up_ratio=16, step_ratio=2, knn=K, growth_rate=G,
                  dense_n=3, max_num_point=N, fm_knn=5)
        params = net.init({"params": jax.random.PRNGKey(0),
                           "patch": jax.random.PRNGKey(1)},
                          f32(1, N, 3), 16, f32(1, N * 16, 3),
                          train=True)["params"]
        n_shape, ratio, num_point = 5000, 16, 312
        num_out = n_shape * ratio

        def run(shape):
            out = upsample_point_cloud(net, params, shape, ratio,
                                       num_point, num_out, chunk=8)
            float(out.std())
            return out

        outs = {}
        for on in (False, True):
            knn_mod.set_exact_select_pallas(on)
            upsample_point_cloud.clear_cache()  # trace-time knob
            t0 = time.time()
            outs[on] = np.asarray(run(jnp.asarray(surface(n_shape, 0))))
            compile_s = time.time() - t0
            ts = []
            for j in range(3):
                fresh = jnp.asarray(surface(n_shape, j + 1))
                t0 = time.perf_counter()
                run(fresh)
                ts.append(time.perf_counter() - t0)
            best = min(ts)
            results[f"e2e s/shape (kernel={on})"] = best
            results[f"e2e TTFS (kernel={on})"] = compile_s
            print(f"e2e kernel={on}: {best:.3f} s/shape "
                  f"({num_out / best / 1e3:.1f}k pts/s), "
                  f"compile {compile_s:.1f}s", flush=True)
        knn_mod.set_exact_select_pallas(False)
        same = bool((outs[False] == outs[True]).all())
        results["e2e outputs bit-identical"] = same
        print(f"e2e outputs bit-identical: {same}", flush=True)

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
