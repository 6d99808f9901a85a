"""Chip A/B of the V2 interlevel selection sweeps (round-5 lever).

The r4e eval_gap re-attribution names the interlevel selection kernel
the x16 chunk's largest single term (37.45 ms = 22% at the l4 operating
point M=6240, k=5).  ``threepu/ops/interlevel_pallas.py::SWEEP_V2``
restructures its hot loop bit-identically (mutation-based exclusion,
~4 elementwise ops/sweep vs ~8) and narrows the selection chunk
(1024 vs 2048: M=6240 pads to 7168 instead of 8192).  This bench
measures, in ONE process with the chained x20/x5 methodology
(CLAUDE.md: never compare against a number from another session):

  A. l4 interlevel term: v1 vs v2-sweeps-only (unit 2048) vs v2-full
     (unit 1024) — separates the two effects;
  B. the full x16 chunk: v1 vs v2 — the end-to-end claim;
  C. bit-identity of the big-M interlevel output across variants on
     chip (selection indices drive an XLA gather tail, so identical
     selections => identical output bits).

Reference term being optimized: the interlevel feature propagation of
``network/upsampler.py:316-347``.

Run on the TPU:  python benchmarks/interlevel_v2_bench.py [--reps 3]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from cascade_decomp import (P_TOP, N_SUB, N, K, G, M_PREV, C_PREV,
                            f32, timeit, chain)
import threepu.ops.interlevel_pallas as il
from threepu.models import Net

B = P_TOP * N_SUB  # 320


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    reps = args.reps

    print("backend:", jax.default_backend(), flush=True)
    results = {}

    prev_xyz0 = f32(P_TOP, M_PREV, 3)
    prev_feat0 = f32(P_TOP, M_PREV, C_PREV)
    pdup0 = jnp.zeros((P_TOP, M_PREV), bool)
    qfeat0 = f32(B, N, C_PREV)

    net = Net(max_up_ratio=16, step_ratio=2, knn=K, growth_rate=G,
              dense_n=3, max_num_point=N, fm_knn=5)
    params = net.init({"params": jax.random.PRNGKey(0),
                       "patch": jax.random.PRNGKey(1)},
                      f32(1, N, 3), 16, f32(1, N * 16, 3),
                      train=True)["params"]

    def il_body(q):
        return il.interlevel_interp_pallas(
            q, qfeat0, prev_xyz0, prev_feat0, pdup0, 5)

    def chunk_body(c):
        return net.apply({"params": params}, c, 16, train=False)

    def bench(tag, body, make_x, n_chain, r=None):
        many, n = chain(body, reps=n_chain)
        results[tag] = timeit(many, make_x, r or reps,
                              f"{tag} [chain/{n}]", chained=n)
        return results[tag]

    # --- C. bit-identity on chip (fixed inputs across variants) --------
    rng = np.random.default_rng(7)
    q_fix = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    outs = {}

    variants = [
        ("v1", False, 2048),
        ("v2 sweeps only (unit 2048)", True, 2048),
        ("v2 full (unit 1024)", True, 1024),
    ]
    for tag, v2, unit in variants:
        il.set_sweep_v2(v2)
        il.SELECT_UNIT_V2 = unit
        jax.clear_caches()
        outs[tag] = np.asarray(il_body(q_fix))
        bench(f"interlevel l4: {tag}", il_body,
              lambda: (f32(B, N, 3),), n_chain=5)
    bit_ok = all(np.array_equal(outs["v1"], o) for o in outs.values())
    print(f"big-M interlevel outputs bit-identical across variants: "
          f"{bit_ok}", flush=True)

    # --- B. full chunk, v1 vs v2-full ----------------------------------
    chunk_outs = {}
    for tag, v2, unit in (("v1", False, 2048), ("v2", True, 1024)):
        il.set_sweep_v2(v2)
        il.SELECT_UNIT_V2 = unit
        jax.clear_caches()
        c_fix = jnp.asarray(
            np.random.default_rng(9).standard_normal((8, N, 3)),
            jnp.float32)
        chunk_outs[tag] = np.asarray(chunk_body(c_fix))
        bench(f"CHUNK x16: {tag}", chunk_body,
              lambda: (f32(8, N, 3),), n_chain=3, r=max(2, reps - 1))
    chunk_bit = np.array_equal(chunk_outs["v1"], chunk_outs["v2"])
    print(f"chunk outputs bit-identical v1 vs v2: {chunk_bit}",
          flush=True)

    il.set_sweep_v2(False)
    il.SELECT_UNIT_V2 = 1024

    ms = {k: round(v * 1e3, 2) for k, v in results.items()}
    ms["bit_identical_interlevel"] = bit_ok
    ms["bit_identical_chunk"] = chunk_bit
    print(json.dumps(ms), flush=True)
    return 0 if (bit_ok and chunk_bit) else 1


if __name__ == "__main__":
    sys.exit(main())
