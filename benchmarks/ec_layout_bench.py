"""On-chip A/B of the fused edge-conv chain layouts at production size.

"lanes" keeps the per-neighbour state as (B, N, k, G) — the G=12
channel axis rides the MXU's 128 lanes, so the one-hot gather and the
12x12 chain matmuls pay ~8-12x lane-quantization waste (the dominant
roofline term, benchmarks/roofline.py).  "transposed" keeps the state
as (B, G, N*k) with the big axis on lanes (layers.FUSED_LAYOUT).

Both layouts are measured in ONE process with fresh inputs per timing
run (CLAUDE.md: chip throughput varies ~±20% between sessions — never
compare a variant against a number from a previous session).

Run on the TPU:  python benchmarks/ec_layout_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import threepu.models.layers as lm
from threepu.models.layers import DenseEdgeConv

REPEAT = 20


def timed(fn, *args):
    out = fn(*args)
    jnp.asarray(out).block_until_ready()
    float(jnp.asarray(out).std())
    return out


def bench(fn, make_args, n=3):
    ts = []
    for _ in range(n):
        args = make_args()
        t0 = time.perf_counter()
        timed(fn, *args)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    b, n_pts, c, k = 320, 312, 24, 32
    mod = DenseEdgeConv(growth_rate=12, n=3, k=k, fused=True)
    x0 = jnp.asarray(rng.standard_normal((b, n_pts, c)).astype(np.float32))
    params = mod.init({"params": jax.random.PRNGKey(0)}, x0)

    def chained(layout):
        def many(x):
            def body(xc, _):
                lm.FUSED_LAYOUT = layout  # traced once per jit
                y, _ = mod.apply(params, xc)
                return xc * (1.0 + 1e-12 * jnp.mean(y)), None
            out, _ = jax.lax.scan(body, x, None, length=REPEAT)
            return out
        return jax.jit(many)

    def fresh():
        return (jnp.asarray(
            rng.standard_normal((b, n_pts, c)).astype(np.float32)),)

    # correctness cross-check first (single application, same input)
    outs = {}
    for layout in ("lanes", "transposed"):
        lm.FUSED_LAYOUT = layout
        f = jax.jit(lambda x, _l=layout: mod.apply(params, x))
        t0 = time.time()
        y, idx = f(x0)
        y.block_until_ready()
        print(f"[{layout}] compile+first: {time.time() - t0:.1f}s",
              flush=True)
        outs[layout] = (np.asarray(y), np.asarray(idx))
    same_idx = bool((outs["lanes"][1] == outs["transposed"][1]).all())
    diff = float(np.max(np.abs(outs["lanes"][0] - outs["transposed"][0])))
    scale = float(np.max(np.abs(outs["lanes"][0])))
    print(f"idx equal {same_idx}; max|dy| {diff:.2e} (scale {scale:.2e})",
          flush=True)

    for layout in ("lanes", "transposed"):
        f = chained(layout)
        timed(f, x0)  # compile
        t = bench(f, fresh) / REPEAT
        print(f"[{layout}] per-op (chained x{REPEAT}): {t*1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
