"""Close the eval-vs-roofline reconciliation (round-3 verdict #1).

Round 3 left a contradiction on the table (``cascade_decomp`` chip log):
the full x16 chunk measures 237 ms but ``Level-4 standalone`` (129.5 ms)
is LESS than the 4 chained DenseEdgeConvs it contains (4 x 57.3 ms).
Two methodology defects explain it, and this bench measures both:

1. **Tunnel latency in single-op timings.** Every single-op number
   through the axon tunnel pays a ~25-60 ms dispatch+fetch round trip
   (the round-2 train-step finding, re-confirmed by single-op 83.4 vs
   chained 57.3 for the same conv).  Everything here is scan-chained.
2. **The standalone conv was NOT measured at its in-level operating
   point.**  Inside a Level every conv receives the level's precomputed
   3-channel xyz duplicate mask (``upsampler.py`` computes it once);
   ``knn_group(unique=True, dup_mask=None)`` in the standalone bench
   instead paid a per-conv 24-channel FEATURE-space dedup sort.

With those controlled, the chunk decomposes into in-context marginal
costs (conv graph-build vs chain, select, dedup, interlevel, decode,
extraction, restitch) that can be compared per-stage against
``roofline.py``'s implemented-program model — naming exactly where the
eval pipeline's remaining wall-clock sits and which terms are
measured-structural (select/sort ops the roofline under-prices) vs
harvestable.

Run on the TPU:  python benchmarks/eval_gap.py [--reps 3]
Results + analysis recorded in benchmarks/RESULTS.md (round 4).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from cascade_decomp import (P_TOP, N_SUB, N, C_FEAT, K, G, M_PREV, C_PREV,
                            f32, timeit, chain)
from threepu.models import Net
from threepu.models.layers import DenseEdgeConv, DenseConv
from threepu.models.upsampler import Level
from threepu.ops import knn_group, duplicate_mask
from threepu.ops.distances import pairwise_dist2
from threepu.ops.normalize import normalize_point_batch_cl

B = P_TOP * N_SUB  # 320


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    reps = args.reps

    print("backend:", jax.default_backend(), flush=True)
    results = {}

    def bench(tag, body, make_x, n_chain=20, r=None):
        many, n = chain(body, reps=n_chain)
        results[tag] = timeit(many, make_x, r or reps,
                              f"{tag} [chain/{n}]", chained=n)
        return results[tag]

    dup0 = jnp.zeros((B, N), bool)

    # ---- calibrator: the full x16 chunk, chained x3 -------------------
    net = Net(max_up_ratio=16, step_ratio=2, knn=K, growth_rate=G,
              dense_n=3, max_num_point=N, fm_knn=5)
    params = net.init({"params": jax.random.PRNGKey(0),
                       "patch": jax.random.PRNGKey(1)},
                      f32(1, N, 3), 16, f32(1, N * 16, 3),
                      train=True)["params"]
    bench("CHUNK x16 (8 patches)",
          lambda c: net.apply({"params": params}, c, 16, train=False),
          lambda: (f32(8, N, 3),), n_chain=3, r=max(2, reps - 1))

    # ---- Level-4 at its in-cascade shapes, chained x5 -----------------
    lvl = Level(dense_n=3, growth_rate=G, knn=K, step_ratio=2, fm_knn=5)
    flat0 = f32(B, N, 3)
    prev_xyz0 = f32(P_TOP, M_PREV, 3)
    prev_feat0 = f32(P_TOP, M_PREV, C_PREV)
    pdup0 = jnp.zeros((P_TOP, M_PREV), bool)
    lparams = lvl.init(jax.random.PRNGKey(2), flat0,
                       normalize_point_batch_cl(flat0)[0],
                       (prev_xyz0, prev_feat0), prev_group=N_SUB,
                       prev_dup=pdup0)["params"]

    def lvl_body(flat):
        nrm = normalize_point_batch_cl(flat)[0]
        return lvl.apply({"params": lparams}, flat, nrm,
                         (prev_xyz0, prev_feat0), prev_group=N_SUB,
                         prev_dup=pdup0)[0]
    bench("Level-4 (B=320 + interlevel)", lvl_body,
          lambda: (f32(B, N, 3),), n_chain=5)

    # ---- one conv, three operating points ------------------------------
    conv = DenseEdgeConv(growth_rate=G, n=3, k=K, fused=True)
    cparams = conv.init({"params": jax.random.PRNGKey(3)}, f32(B, N, C_FEAT))

    bench("conv: dup_mask=None (r3 methodology)",
          lambda x: conv.apply(cparams, x)[0],
          lambda: (f32(B, N, C_FEAT),))
    bench("conv: dup_mask precomputed (in-level)",
          lambda x: conv.apply(cparams, x, dup_mask=dup0)[0],
          lambda: (f32(B, N, C_FEAT),))
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)
    bench("conv: idx precomputed (chain+pool only)",
          lambda x: conv.apply(cparams, x, idx=idx0)[0],
          lambda: (f32(B, N, C_FEAT),))

    # ---- graph build in-level conditions, isolated ---------------------
    bench("knn_group feats (dup precomp, HIGH)",
          lambda x: knn_group(x, x, K + 1, unique=True, dup_mask=dup0,
                              with_neighbors=False,
                              precision=jax.lax.Precision.HIGH).idx,
          lambda: (f32(B, N, C_FEAT),))
    bench("knn_group feats (dup=None, r3 method)",
          lambda x: knn_group(x, x, K + 1, unique=True,
                              with_neighbors=False,
                              precision=jax.lax.Precision.HIGH).idx,
          lambda: (f32(B, N, C_FEAT),))
    bench("pairwise_dist2 (320,312,24) HIGH",
          lambda x: pairwise_dist2(x, x,
                                   precision=jax.lax.Precision.HIGH),
          lambda: (f32(B, N, C_FEAT),))
    bench("lax.top_k k=33 on (320,312,312)",
          lambda d: jax.lax.top_k(-d, K + 1)[1],
          lambda: (f32(B, N, N),), n_chain=10)
    # select-implementation variants at the same site: is the exact
    # top_k at its floor?  full-sort selection (the partition-safe
    # backend, identical indices), and approx_max_k (recall .95 — the
    # ceiling an inexact select could buy; changes semantics)
    bench("select variant: lax.sort full",
          lambda d: jax.lax.sort(
              (d, jax.lax.broadcasted_iota(jnp.int32, d.shape, 2)),
              dimension=2, num_keys=1)[1][..., :K + 1],
          lambda: (f32(B, N, N),), n_chain=10)
    bench("select variant: approx recall .95",
          lambda d: jax.lax.approx_min_k(d, K + 1, recall_target=0.95)[1],
          lambda: (f32(B, N, N),), n_chain=10)
    bench("duplicate_mask (320,312,3) [1x/level]",
          lambda x: duplicate_mask(x),
          lambda: (f32(B, N, 3),))

    # ---- the level's non-conv stages, chained ---------------------------
    from threepu.ops.interlevel_pallas import interlevel_interp_pallas
    qfeat0 = f32(B, N, C_PREV)
    bench("interlevel l4 (M=6240,k=5)",
          lambda q: interlevel_interp_pallas(
              q, qfeat0, prev_xyz0, prev_feat0, pdup0, 5),
          lambda: (f32(B, N, 3),), n_chain=5)

    dec = [DenseConv(128, "relu"), DenseConv(128, "relu"),
           DenseConv(64, "relu"), DenseConv(3, None)]
    dparams, h = [], f32(B, N * 2, C_PREV + 2)
    for i, m in enumerate(dec):
        dparams.append(m.init(jax.random.PRNGKey(10 + i), h))
        h = m.apply(dparams[i], h)

    def decode(x):
        for m, p in zip(dec, dparams):
            x = m.apply(p, x)
        return x
    bench("decode MLP (320,624,266->3)", decode,
          lambda: (f32(B, N * 2, C_PREV + 2),))

    # ---- reconciliation ---------------------------------------------------
    ms = {k: v * 1e3 for k, v in results.items()}
    conv_lvl = ms["conv: dup_mask precomputed (in-level)"]
    print("\n--- reconciliation (all ms, in-context chained) ---")
    print(f"conv r3-methodology - in-level     = "
          f"{ms['conv: dup_mask=None (r3 methodology)'] - conv_lvl:7.1f}"
          f"  (per-conv feature-dedup the level never pays)")
    graph = ms["knn_group feats (dup precomp, HIGH)"]
    print(f"conv in-level: graph {graph:.1f} + chain "
          f"{ms['conv: idx precomputed (chain+pool only)']:.1f} "
          f"vs whole {conv_lvl:.1f}")
    lvl_parts = (4 * conv_lvl
                 + ms["interlevel l4 (M=6240,k=5)"]
                 + ms["decode MLP (320,624,266->3)"]
                 + ms["duplicate_mask (320,312,3) [1x/level]"])
    print(f"Level-4: sum(4 conv + interlevel + decode + dup) = "
          f"{lvl_parts:7.1f} vs measured "
          f"{ms['Level-4 (B=320 + interlevel)']:7.1f}")
    print(f"chunk measured {ms['CHUNK x16 (8 patches)']:.1f}")
    import json
    print(json.dumps({k: round(v, 2) for k, v in ms.items()}))


if __name__ == "__main__":
    main()
