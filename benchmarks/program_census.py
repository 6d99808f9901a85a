"""Census of Pallas kernel instances in the headline eval pipeline.

Each *distinct* ``pallas_call`` signature (kernel builder + grid + block
shapes) costs a ~60-100 s axon remote kernel compile (CLAUDE.md), so
time-to-first-shape is roughly ``xla_base + 60..100 * n_instances``.
This script traces ``upsample_point_cloud`` on CPU with the TPU dispatch
paths forced, records every pallas_call signature, and prints the
deduplicated inventory — the compile-cost ledger behind BENCH's
``compile_s``.

Run anywhere:  python benchmarks/program_census.py
"""

import collections
import os
import sys
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from jax.experimental import pallas as pl


def census(ratio=16, n_shape=5000, num_point=312, chunk=8):
    from threepu.models import Net
    from threepu import inference

    calls = []
    orig = pl.pallas_call

    def recording(kernel, *a, **kw):
        grid = kw.get("grid")
        gs = kw.get("grid_spec")
        if grid is None and gs is not None:
            grid = getattr(gs, "grid", None)
        out_shape = kw.get("out_shape")
        shapes = jax.tree_util.tree_map(
            lambda s: (tuple(s.shape), str(s.dtype)), out_shape)
        calls.append((getattr(kernel, "__qualname__", str(kernel)),
                      tuple(grid) if grid is not None else None,
                      str(shapes)))

        def dummy(*ops):
            return jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), out_shape)
        return dummy

    net = Net(max_up_ratio=16, step_ratio=2, knn=32, growth_rate=12,
              dense_n=3, max_num_point=num_point, fm_knn=5)
    rng = np.random.default_rng(0)
    ex = jnp.asarray(rng.standard_normal((1, num_point, 3)), jnp.float32)
    gt = jnp.asarray(
        rng.standard_normal((1, num_point * ratio, 3)), jnp.float32)
    params = net.init({"params": jax.random.PRNGKey(0),
                       "patch": jax.random.PRNGKey(1)},
                      ex, ratio, gt, train=True)["params"]
    xyz = jnp.asarray(rng.standard_normal((n_shape, 3)), jnp.float32)

    with mock.patch.object(pl, "pallas_call", recording), \
            mock.patch.object(jax, "default_backend", lambda: "tpu"):
        jax.make_jaxpr(
            lambda x: inference.upsample_point_cloud.__wrapped__(
                net, params, x, ratio, num_point, n_shape * ratio,
                chunk=chunk))(xyz)

    counts = collections.Counter(calls)
    print(f"pallas_call sites in the {ratio}x {n_shape}->"
          f"{n_shape * ratio} pipeline (chunk={chunk}):")
    total_instances = len(counts)
    total_calls = sum(counts.values())
    for (name, grid, shapes), c in sorted(counts.items()):
        print(f"  {c:3d}x  {name}  grid={grid}  out={shapes}")
    print(f"distinct instances: {total_instances}   "
          f"total call sites: {total_calls}")
    return counts


if __name__ == "__main__":
    census()
