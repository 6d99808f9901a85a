"""Reconcile the eval cascade's measured time against its parts.

Motivation (round 3): the train-step roofline achieves ~96% of its
implemented-program roof while the eval pipeline sits at ~30%
(``benchmarks/roofline.py``), yet both share the same edge-conv core —
AND the standalone edge-conv microbench (``ec_bench.py``: ~72 ms/op at
B=320, scan-chained) is arithmetically incompatible with the full-chunk
measurement (``profile_stages.py``: 238 ms for a chunk that CONTAINS
four such convs at B=320 plus three levels of everything else).  At
least one of {the microbench methodology, the per-stage roofline, the
attribution} is mis-calibrated.  This bench times every part of one
x16 cascade chunk at its exact in-cascade shape, in ONE process, and
prints the reconciliation table:

- the full chunk (calibrator, = profile_stages' 238 ms entry),
- a standalone Level-4 apply at its in-cascade shapes,
- one fused DenseEdgeConv at B=320: single-op AND scan-chained x20
  (the two methodologies, head to head),
- the conv's internals, isolated: feature-space pairwise distances,
  exact top-k (the lax.top_k sort), the sort-based duplicate mask,
  the one-hot neighbour gather,
- the decode MLP stack, the interlevel kernel at l4 shapes, sub-patch
  extraction, and the per-level FPS restitch.

Run on the TPU:  python benchmarks/cascade_decomp.py [--reps 5]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from threepu.models import Net
from threepu.models.layers import DenseEdgeConv, DenseConv
from threepu.models.upsampler import Level
from threepu.ops import knn_group, gather_nd, duplicate_mask
from threepu.ops.distances import pairwise_dist2
from threepu.ops.fps import _dispatch_fps, fps_indices
from threepu.ops.chamfer import self_nn_dist2
from threepu.ops.gather import batched_gather
from threepu.ops.normalize import normalize_point_batch_cl

# l4-chunk shapes of the 16x headline pipeline (5000 pts, 312-pt
# patches, chunk=8): 8 top patches x 40 sub-patches = B=320 at n=312;
# previous set = 20 l3 sub-patches x 312 = 6240 per top patch
P_TOP, N_SUB, N, C_FEAT, K, G = 8, 40, 312, 24, 32, 12
M_PREV, C_PREV = 6240, 264

rng = np.random.default_rng(0)
_key_counter = [0]


from functools import lru_cache


@lru_cache(maxsize=None)
def _gen_normal(shape):
    return jax.jit(lambda key: jax.random.normal(key, shape, jnp.float32))


def f32(*shape, scale=1.0):
    """Fresh DEVICE-resident standard-normal array.

    Generated on device from a per-call PRNG key: a distinct buffer
    every call (defeats the tunnel's (executable, inputs) memoization)
    with NO host->device transfer — fresh numpy inputs made the timed
    region transfer-dominated (~47 MB/s tunnel: a (320,312,312) f32
    operand alone is 125 MB ~ 2.7 s, dwarfing every op).  Residency is
    forced in ``timeit`` before the timer starts.
    """
    _key_counter[0] += 1
    out = _gen_normal(shape)(jax.random.PRNGKey(_key_counter[0]))
    return out * scale if scale != 1.0 else out


def _force_resident(args):
    for a in args:
        if isinstance(a, jax.Array):
            float(jnp.asarray(a).ravel()[0].astype(jnp.float32))


def timeit(fn, make_args, reps, tag, chained=None):
    args = make_args()
    _force_resident(args)
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]
                      ).astype(jnp.float32).std())
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        args = make_args()
        _force_resident(args)
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]
                          ).astype(jnp.float32).std())
        ts.append(time.perf_counter() - t0)
    per = min(ts) / (chained or 1)
    print(f"{tag:42s} {per*1e3:9.2f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return per


def chain(body, reps=20):
    """ec_bench's scan-chained methodology: REPS dependent applications
    in one program; per-op = total / REPS."""
    def many(x):
        def step(xc, _):
            out = body(xc)
            leaf = jnp.asarray(jax.tree_util.tree_leaves(out)[0])
            return xc * (1.0 + 1e-12 * jnp.mean(leaf.astype(jnp.float32))
                         ), None
        out, _ = jax.lax.scan(step, x, None, length=reps)
        return out
    return jax.jit(many), reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    reps = args.reps

    print("backend:", jax.default_backend(), flush=True)

    # ---- calibrator: one full x16 chunk (profile_stages' 238 ms) ----
    net = Net(max_up_ratio=16, step_ratio=2, knn=K, growth_rate=G,
              dense_n=3, max_num_point=N, fm_knn=5)
    ex = f32(1, N, 3)
    params = net.init({"params": jax.random.PRNGKey(0),
                       "patch": jax.random.PRNGKey(1)},
                      ex, 16, f32(1, N * 16, 3), train=True)["params"]
    chunk_fn = jax.jit(lambda c: net.apply({"params": params}, c, 16,
                                           train=False))
    t_chunk = timeit(chunk_fn, lambda: (f32(8, N, 3),), max(2, reps // 2),
                     "FULL CHUNK x16 (8 patches)")

    # ---- standalone Level at l4 shapes --------------------------------
    lvl = Level(dense_n=3, growth_rate=G, knn=K, step_ratio=2, fm_knn=5)
    flat0 = f32(P_TOP * N_SUB, N, 3)
    norm0 = normalize_point_batch_cl(flat0)[0]
    prev0 = (f32(P_TOP, M_PREV, 3), f32(P_TOP, M_PREV, C_PREV))
    dup0 = jnp.zeros((P_TOP, M_PREV), bool)
    lparams = lvl.init(jax.random.PRNGKey(2), flat0, norm0, prev0,
                       prev_group=N_SUB, prev_dup=dup0)["params"]

    def lvl_apply(flat, prev_xyz, prev_feat):
        nrm = normalize_point_batch_cl(flat)[0]
        return lvl.apply({"params": lparams}, flat, nrm,
                         (prev_xyz, prev_feat), prev_group=N_SUB,
                         prev_dup=dup0)[0]

    t_lvl = timeit(jax.jit(lvl_apply),
                   lambda: (f32(P_TOP * N_SUB, N, 3),
                            f32(P_TOP, M_PREV, 3),
                            f32(P_TOP, M_PREV, C_PREV)),
                   reps, "Level-4 standalone (B=320 + interlevel)")

    # ---- one fused DenseEdgeConv at B=320: both methodologies ---------
    conv = DenseEdgeConv(growth_rate=G, n=3, k=K, fused=True)
    x0 = f32(P_TOP * N_SUB, N, C_FEAT)
    cparams = conv.init({"params": jax.random.PRNGKey(3)}, x0)
    conv1 = jax.jit(lambda x: conv.apply(cparams, x)[0])
    t_conv = timeit(conv1, lambda: (f32(P_TOP * N_SUB, N, C_FEAT),),
                    reps, "DenseEdgeConv B=320 single-op")
    many, n_ch = chain(lambda x: conv.apply(cparams, x))
    timeit(many, lambda: (f32(P_TOP * N_SUB, N, C_FEAT),),
           max(2, reps // 2), f"DenseEdgeConv B=320 scan-chain/{n_ch}",
           chained=n_ch)

    # ---- conv internals, isolated -------------------------------------
    b = P_TOP * N_SUB
    timeit(jax.jit(lambda x: pairwise_dist2(x, x)),
           lambda: (f32(b, N, C_FEAT),), reps,
           "pairwise_dist2 (320,312,24) HIGHEST")
    timeit(jax.jit(lambda d: jax.lax.top_k(-d, K + 1)[1]),
           lambda: (f32(b, N, N),), reps,
           "lax.top_k k=33 on (320,312,312)")
    timeit(jax.jit(lambda x: knn_group(x, x, K + 1, unique=True,
                                       dup_mask=jnp.zeros((b, N), bool),
                                       with_neighbors=False).idx),
           lambda: (f32(b, N, C_FEAT),), reps,
           "knn_group feats k=33 (dist+top_k)")
    timeit(jax.jit(duplicate_mask), lambda: (f32(b, N, 3),), reps,
           "duplicate_mask (320,312,3) sorts")
    idx0 = jnp.asarray(rng.integers(0, N, (b, N, K)), jnp.int32)
    timeit(jax.jit(batched_gather),
           lambda: (f32(b, N, G), idx0), reps,
           "one-hot gather z(320,312,12) k=32")

    # ---- decode MLP stack at l4 shapes ---------------------------------
    dec = [DenseConv(128, "relu"), DenseConv(128, "relu"),
           DenseConv(64, "relu"), DenseConv(3, None)]
    dx0 = f32(b, N * 2, C_PREV + 2)
    dparams = []
    h = dx0
    for i, m in enumerate(dec):
        dparams.append(m.init(jax.random.PRNGKey(10 + i), h))
        h = m.apply(dparams[i], h)

    def decode(x):
        for m, p in zip(dec, dparams):
            x = m.apply(p, x)
        return x
    timeit(jax.jit(decode), lambda: (f32(b, N * 2, C_PREV + 2),), reps,
           "decode MLP (320,624,266->...->3)")

    # ---- interlevel kernel at l4 shapes --------------------------------
    from threepu.ops.interlevel_pallas import interlevel_interp_pallas
    timeit(jax.jit(lambda q, xq, px, pf: interlevel_interp_pallas(
               q, xq, px, pf, dup0, 5)),
           lambda: (f32(b, N, 3), f32(b, N, C_PREV),
                    f32(P_TOP, M_PREV, 3), f32(P_TOP, M_PREV, C_PREV)),
           reps, "interlevel kernel l4 (M=6240,k=5)")

    # ---- sub-patch extraction at l4 ------------------------------------
    def extract(xyz):
        closest = self_nn_dist2(xyz)
        mask = closest < 5.0 * jnp.mean(closest, axis=-1, keepdims=True)
        seed_idx = fps_indices(xyz, N_SUB, valid_mask=mask)
        seeds = gather_nd(xyz, seed_idx)
        return knn_group(seeds, xyz, N, valid_mask=mask).neighbors
    timeit(jax.jit(extract), lambda: (f32(P_TOP, 2496, 3),), reps,
           "extraction l4 (8,2496)->(8,40,312)")

    # ---- per-level FPS restitch at l4 ----------------------------------
    timeit(jax.jit(lambda m: _dispatch_fps(m, 4992, None, None)),
           lambda: (f32(P_TOP, N_SUB * N * 2, 3),), reps,
           "restitch FPS (8,24960)->4992")

    print(f"\ncalibrators: chunk {t_chunk*1e3:.0f} ms, level-4 "
          f"{t_lvl*1e3:.0f} ms, conv single {t_conv*1e3:.0f} ms "
          f"(x4 convs = {4*t_conv*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
