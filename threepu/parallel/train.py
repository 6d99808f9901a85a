"""Data-parallel (patch-parallel) training over a device mesh.

The whole optimization step is a single jit program with sharding
annotations: params/optimizer state replicated, the patch batch sharded
over the ``data`` axis.  The mean in the Chamfer loss spans the global
batch, so XLA lowers the gradient reduction to an all-reduce over ICI —
the TPU-native replacement for what a NCCL DDP wrapper would do.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import optax

from threepu.losses import chamfer_loss
from threepu.ops.knn import shard_select
from threepu.train.model import TrainState, loss_weight


def make_sharded_train_step(net, tx, mesh, axis_name: str = "data"):
    """Returns a function with the same signature as
    :func:`threepu.train.train_step` (net/tx arguments accepted and
    ignored — they are closed over), running sharded over ``mesh``."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))

    @partial(jax.jit,
             static_argnames=("ratio", "threshold", "weight_mode",
                              "with_pred"),
             in_shardings=(repl, repl, shard, shard),
             donate_argnums=(0,))
    def step(state: TrainState, key, inp, gt, ratio: int,
             threshold: Optional[float] = None,
             weight_mode: str = "floored", with_pred: bool = False):
        weight = loss_weight(ratio, net.max_up_ratio, net.step_ratio,
                             weight_mode)

        def loss_fn(params):
            pred, gt_out = net.apply({"params": params}, inp, ratio, gt,
                                     train=True, rngs={"patch": key})
            cd = chamfer_loss(pred, gt_out, threshold=threshold)
            return cd * weight, (cd, pred, gt_out)

        # GSPMD cannot partition lax.top_k over the sharded batch axis:
        # every kNN selection would all-gather its (B, N, N) operand
        # (measured, tests/test_collectives.py).  Trace selections as
        # per-device-local shard_map bodies instead — bit-identical
        # indices, zero forward collectives, and the TPU exact-selection
        # Pallas kernel engages per shard exactly like the serial step
        # (the earlier partition-safe sort paid a full variadic sort
        # per site, ~2x the kernel at the conv sites).
        with shard_select(mesh, axis_name):
            (_, (cd, pred, gt_out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_opt, state.step + 1)
        if with_pred:
            return new_state, cd, (pred, gt_out)
        return new_state, cd

    def wrapped(_net, _tx, state, key, inp, gt, ratio,
                threshold=None, weight_mode="floored", with_pred=False):
        # jit's in_shardings reshard host/replicated inputs on entry —
        # no per-step device_put round trip.  Positional args only
        # (pjit requirement with in_shardings).
        return step(state, key, inp, gt, ratio, threshold, weight_mode,
                    with_pred)

    # the underlying jit, for .lower()/HLO inspection (the collective
    # audit in tests/test_collectives.py and the on-chip shard_select
    # verification in benchmarks/verify_shard_select.py)
    wrapped.jit_step = step
    return wrapped
