"""Bisect which kernel-v2 feature kills the Mosaic remote compiler.

Each probe is a minimal standalone pallas kernel exercising ONE pattern
from the packed-layout edge-conv kernel at production sizes:

  p1  reshape (TP*K, G) -> (TP, K*G) after a plain read
  p2  tpu.dynamic_gather (take_along_axis formulation)
  p3  matmul against a block-diagonal (K*G, K*G) operand
  p4  broadcast point term (TP, G) -> (TP, K*G)
  p5  one-hot bf16 matmul + packed reshape (v2 onehot path, no chain)

Run: python benchmarks/ec_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TP, K, G, N_PAD = 64, 32, 12, 384
ROWS = TP * K
KG = K * G


def run(name, kernel, out_shape, *args):
    try:
        t0 = time.time()
        out = pl.pallas_call(
            kernel, out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
        out.block_until_ready()
        s = float(jnp.asarray(out).astype(jnp.float32).std())
        print(f"  [ok] {name}: {time.time()-t0:.1f}s std={s:.3f}",
              flush=True)
        return out
    except Exception as e:
        print(f"  [FAIL] {name}: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((N_PAD, G)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 312, (TP, K)), jnp.int32)
    big = jnp.asarray(rng.standard_normal((ROWS, G)), jnp.float32)
    wbd = jnp.asarray(rng.standard_normal((KG, KG)), jnp.float32)
    pt = jnp.asarray(rng.standard_normal((TP, G)), jnp.float32)

    def p1(big_ref, o_ref):
        o_ref[:] = big_ref[:].reshape(TP, KG)
    run("p1 reshape rows->packed", p1,
        jax.ShapeDtypeStruct((TP, KG), jnp.float32), big)

    def p2(z_ref, idx_ref, o_ref):
        zb = jnp.pad(z_ref[:], ((0, ROWS - N_PAD), (0, 0)))
        ix = jnp.broadcast_to(idx_ref[:].reshape(ROWS, 1), (ROWS, G))
        o_ref[:] = jnp.take_along_axis(zb, ix, axis=0,
                                       mode="promise_in_bounds")
    run("p2 dynamic_gather", p2,
        jax.ShapeDtypeStruct((ROWS, G), jnp.float32), z, idx)

    def p3(a_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:].reshape(TP, KG), w_ref[:],
                           preferred_element_type=jnp.float32)
    run("p3 blockdiag matmul", p3,
        jax.ShapeDtypeStruct((TP, KG), jnp.float32), big, wbd)

    def p4(pt_ref, o_ref):
        o_ref[:] = jnp.broadcast_to(
            pt_ref[:][:, None, :], (TP, K, G)).reshape(TP, KG)
    run("p4 point-term broadcast", p4,
        jax.ShapeDtypeStruct((TP, KG), jnp.float32), pt)

    def p5(z_ref, idx_ref, o_ref):
        zf = z_ref[:]
        z_hi = zf.astype(jnp.bfloat16)
        z_lo = (zf - z_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (TP, K, N_PAD), 2)
        oh = (idx_ref[:][:, :, None] == iota_n).astype(
            jnp.bfloat16).reshape(ROWS, N_PAD)
        zn = (jnp.dot(oh, z_hi, preferred_element_type=jnp.float32)
              + jnp.dot(oh, z_lo, preferred_element_type=jnp.float32))
        o_ref[:] = zn.reshape(TP, KG)
    run("p5 onehot + packed reshape", p5,
        jax.ShapeDtypeStruct((TP, KG), jnp.float32), z, idx)


if __name__ == "__main__":
    main()
