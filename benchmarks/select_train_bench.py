"""A/B the Pallas exact-selection default on the TRAIN step.

The eval side of the round-4 default flip is measured
(``select_pallas_bench.py``: chunk 218.7 -> 170.0 ms, headline 59.0k
-> 75.3k pts/s, bit-identical).  The train step shares the conv-site
selection (k=33 over (B*N, N) distance blocks inside the re-patched
cascade) but differentiates through it — the kernel's custom VJP
scatter vs XLA's fused top_k gradient is a different backward program,
so the 42.7 steps/s pipelined number must be re-measured, not assumed.

Method: the ``run_benchmarks.bench_3_train`` methodology (batch 16 x
312-pt patches at x16, 30 async steps + one fetch, fresh inputs) run
twice in ONE process — kernel off then on — plus a 5-step loss
bit-equality check between the two programs.

Run on the TPU:  python benchmarks/select_train_bench.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from threepu.models import Net
from threepu.ops import knn as knn_mod
from threepu.train.model import (create_train_state, make_optimizer,
                                 train_step)


def main() -> int:
    print("backend:", jax.default_backend(), flush=True)
    net = Net(max_up_ratio=16, step_ratio=2, knn=32, growth_rate=12,
              dense_n=3, max_num_point=312, fm_knn=5)
    rng = np.random.default_rng(2)
    inp = jnp.asarray(rng.standard_normal((16, 312, 3)).astype(np.float32))
    gt = jnp.asarray(
        rng.standard_normal((16, 312 * 16, 3)).astype(np.float32))
    tx = make_optimizer(5e-4)
    results = {}

    losses = {}
    for enabled in (False, True):
        tag = "kernel" if enabled else "topk"
        knn_mod.set_exact_select_pallas(enabled)
        jax.clear_caches()
        t0 = time.time()
        state = create_train_state(net, jax.random.PRNGKey(0), inp, gt,
                                   16, tx=tx)
        ls = []
        for i in range(5):
            state, cd = train_step(net, tx, state, jax.random.PRNGKey(i),
                                   inp, gt, 16)
            ls.append(float(cd))
        compile_s = time.time() - t0
        losses[tag] = ls
        # pipelined: N async steps + one final fetch (per-call blocking
        # timing would measure the axon round trip, not the step)
        inp2 = jnp.asarray(
            rng.standard_normal(inp.shape).astype(np.float32))
        gt2 = jnp.asarray(rng.standard_normal(gt.shape).astype(np.float32))
        steps = 30
        t0 = time.time()
        for i in range(steps):
            state, cd = train_step(net, tx, state,
                                   jax.random.PRNGKey(100 + i),
                                   inp2, gt2, 16)
        float(cd)
        sec = (time.time() - t0) / steps
        results[tag] = {"steps_per_sec": round(1.0 / sec, 2),
                        "compile_plus_5steps_s": round(compile_s, 1)}
        print(f"{tag}: {1.0 / sec:.2f} steps/s "
              f"(compile+5 {compile_s:.1f}s)", flush=True)

    knn_mod.set_exact_select_pallas(True)
    # forward selection is bit-identical; the kernel's custom-VJP
    # scatter is the same math as top_k's gradient but a different HLO
    # program, so XLA's downstream fusion reassociates at ulp level —
    # expect losses equal to ~1e-6 relative, not necessarily bit-equal
    # (measured on chip: 2/3744 grad elements off by 1 ulp)
    lt, lk = np.asarray(losses["topk"]), np.asarray(losses["kernel"])
    results["losses_bit_identical"] = losses["topk"] == losses["kernel"]
    results["losses_allclose_1e-5"] = bool(
        np.allclose(lt, lk, rtol=1e-5, atol=1e-7))
    results["losses_max_rel_diff"] = float(
        np.max(np.abs(lt - lk) / np.maximum(np.abs(lt), 1e-12)))
    results["losses"] = losses
    print("5-step losses bit-identical:",
          results["losses_bit_identical"],
          "allclose@1e-5:", results["losses_allclose_1e-5"],
          f"max rel diff {results['losses_max_rel_diff']:.2e}",
          flush=True)
    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
