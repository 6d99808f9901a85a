"""On-chip microbenchmark + equivalence check of the fused edge-conv
chain kernel vs the XLA decomposed schedule, at production cascade sizes
(N=312, k=32, growth 12, dense_n 3; B = the level-4 sub-patch batch).

Run on the TPU:  python benchmarks/ec_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from threepu.models.layers import DenseEdgeConv
import threepu.ops.edgeconv_pallas as ecp


def timed(fn, *args):
    out = fn(*args)
    jnp.asarray(out[0]).block_until_ready()
    float(jnp.asarray(out[0]).std())
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
    skip_xla = "--skip-xla" in sys.argv
    rng = np.random.default_rng(0)
    b, n_pts, c, k = 320, 312, 24, 32
    mod = DenseEdgeConv(growth_rate=12, n=3, k=k, fused=True)
    x0 = jnp.asarray(rng.standard_normal((b, n_pts, c)).astype(np.float32))
    params = mod.init({"params": jax.random.PRNGKey(0)}, x0)

    REPEAT = 20

    def chained(apply_fn):
        # R dependent applications in one program (scan: one body
        # compile): the per-op time dominates the (highly variable)
        # tunnel transfer cost
        def many(x):
            def body(xc, _):
                y, _ = apply_fn(xc)
                return xc * (1.0 + 1e-12 * jnp.mean(y)), None
            out, _ = jax.lax.scan(body, x, None, length=REPEAT)
            return out
        return jax.jit(many)

    xla = jax.jit(lambda x: mod.apply(params, x))
    xla_many = chained(lambda x: mod.apply(params, x))

    def fresh():
        return (jnp.asarray(
            rng.standard_normal((b, n_pts, c)).astype(np.float32)),)

    if skip_xla:
        # timing-iteration mode: the XLA path costs ~7 min of compile;
        # correctness vs XLA is established by the default mode + CPU
        # suite
        y_ref = idx_ref = None
        t_x = float("nan")
    else:
        t0 = time.time()
        y_ref, idx_ref = timed(xla, x0)
        print(f"xla compile+first: {time.time() - t0:.1f}s", flush=True)
        timed(xla_many, x0)
        t_x = bench(xla_many, fresh) / REPEAT
        print(f"xla per-op (chained x{REPEAT}): {t_x*1e3:.1f} ms",
              flush=True)

    for mode in ("onehot", "onehot_fast"):
        ecp.GATHER_MODE = mode
        pls = jax.jit(lambda x, _m=mode: mod.apply(params, x, pallas=True))
        try:
            t0 = time.time()
            y_k, idx_k = timed(pls, x0)
            print(f"pallas[{mode}] compile+first: "
                  f"{time.time() - t0:.1f}s", flush=True)
        except Exception as e:  # unsupported lowering etc.
            print(f"pallas[{mode}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        if y_ref is None:
            y_ref, idx_ref = y_k, idx_k
        same_idx = bool(jnp.all(idx_ref == idx_k))
        diff = float(jnp.max(jnp.abs(y_ref - y_k)))
        scale = float(jnp.max(jnp.abs(y_ref)))
        pls_many = chained(
            lambda x, _m=mode: mod.apply(params, x, pallas=True))
        timed(pls_many, x0)
        t_p = bench(pls_many, fresh) / REPEAT
        print(f"pallas[{mode}]: idx equal {same_idx}; max|dy| {diff:.2e} "
              f"(scale {scale:.2e}); per-op {t_p*1e3:.1f} ms "
              f"(vs xla {t_x/t_p:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
