"""Stage-level cost attribution of the 16x headline pipeline on chip.

`jax.profiler.trace` does not work through the axon tunnel
(CLAUDE.md), so attribution is manual: each stage runs as a separate
jitted program with fresh inputs and a forced device->host fetch.
Stage boundaries materialize intermediates the fused pipeline would
overlap, so the stage sum slightly exceeds the end-to-end wall time —
use for attribution, bench.py for the headline.

  1. seed FPS + kNN grouping (5000 -> 48 x 312 patches)
  2. the cascade, one chunk at each ratio 2/4/8/16 (differences
     attribute per-level add-on cost)
  3. full 6-chunk cascade at x16
  4. final merged-cloud FPS restitch (240k -> 80k)

Toggle: --noshare disables upsampler.SHARE_EVAL_INSTANCES (the
round-3 instance-sharing ablation).  Results recorded in RESULTS.md.

Run on the TPU:  python benchmarks/profile_stages.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import threepu.models.upsampler as ups

if "--noshare" in sys.argv:
    ups.SHARE_EVAL_INSTANCES = False

from threepu.models import Net
from threepu.ops import knn_group, gather_nd
from threepu.ops.fps import _dispatch_fps
from threepu.ops.normalize import normalize_point_batch_cl

print("backend:", jax.default_backend(),
      "share:", ups.SHARE_EVAL_INSTANCES, flush=True)

n_shape, ratio, num_point = 5000, 16, 312
num_patches, chunk = 48, 8

net = Net(max_up_ratio=16, step_ratio=2, knn=32, growth_rate=12,
          dense_n=3, max_num_point=312, fm_knn=5)
rng = np.random.default_rng(0)
gt = jnp.asarray(rng.standard_normal((1, num_point * ratio, 3))
                 .astype(np.float32))
ex = jnp.asarray(rng.standard_normal((1, num_point, 3))
                 .astype(np.float32))
params = net.init({"params": jax.random.PRNGKey(0),
                   "patch": jax.random.PRNGKey(1)},
                  ex, ratio, gt, train=True)["params"]


def timeit(fn, make_args, reps=3, tag=""):
    args = make_args()
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).std())
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        args = make_args()
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).std())
        ts.append(time.perf_counter() - t0)
    print(f"{tag:34s} {min(ts)*1e3:9.1f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return min(ts)


def fresh_shape():
    s = rng.standard_normal((n_shape, 3)).astype(np.float32)
    return (jnp.asarray(s / np.abs(s).max()),)


# 1. seed FPS + group
@jax.jit
def group(xyz):
    shape_b = xyz[None]
    seed_idx = _dispatch_fps(shape_b, num_patches, None, None)
    seeds = gather_nd(shape_b, seed_idx)
    return knn_group(seeds, shape_b, num_point).neighbors[0]

t_group = timeit(group, fresh_shape, tag="seed FPS + group")

patches = group(fresh_shape()[0])
norm, centroid, radius = normalize_point_batch_cl(patches)


def fresh_chunk():
    j = jnp.asarray(rng.standard_normal((chunk, num_point, 3))
                    .astype(np.float32) * 0.01)
    return (norm[:chunk] + j,)


# 2. one chunk at each ratio
prev = 0.0
for r in (2, 4, 8, 16):
    f = jax.jit(lambda c, r=r: net.apply({"params": params}, c, r,
                                         train=False))
    t = timeit(f, fresh_chunk, tag=f"cascade chunk8 x{r}")
    if prev:
        print(f"{'  -> level x'+str(r)+' add-on':34s} {(t-prev)*1e3:9.1f} ms",
              flush=True)
    prev = t

# 3. full 6-chunk x16 cascade
@jax.jit
def cascade(norm):
    chunked = norm.reshape(6, chunk, num_point, 3)
    up = jax.lax.map(
        lambda c: net.apply({"params": params}, c, ratio, train=False),
        chunked)
    return up.reshape(6 * chunk, num_point * ratio, 3)

def fresh_norm():
    j = jnp.asarray(rng.standard_normal(norm.shape).astype(np.float32)
                    * 0.01)
    return (norm + j,)

t_casc = timeit(cascade, fresh_norm, reps=2, tag="full cascade 6 chunks x16")

# 4. final restitch FPS (merged 240k -> 80k)
merged_n = 48 * num_point * ratio
@jax.jit
def restitch(merged):
    idx = _dispatch_fps(merged, n_shape * ratio, None, None)
    return gather_nd(merged, idx)

def fresh_merged():
    return (jnp.asarray(rng.standard_normal((1, merged_n, 3))
                        .astype(np.float32)),)

t_fps = timeit(restitch, fresh_merged, tag="final FPS 240k->80k")

print(f"\nattribution: group {t_group*1e3:.0f} + cascade "
      f"{t_casc*1e3:.0f} + finalFPS {t_fps*1e3:.0f} = "
      f"{(t_group+t_casc+t_fps)*1e3:.0f} ms", flush=True)
