"""The full training loop.

Reference equivalent: ``train()`` in ``main.py:127-211`` — epoch loop
over 300*batch_size curriculum batches, stage/combined/threshold
transitions, running-mean loss logging, checkpoint every 20 epochs with
the global step embedded so a restart restores the curriculum exactly
(``main.py:141-157``).

TPU re-design: the curriculum is a pure function of the step
(:mod:`threepu.data.curriculum`), the batch is sampled *on device* inside
jit, and the optimizer step is a donated jit program — the host loop only
draws ratios and handles logging/checkpoints.  A :class:`Prefetcher`
keeps sampling ahead of the train step.
"""

from __future__ import annotations

import dataclasses
import os
import time
from collections import defaultdict
from typing import Callable, Optional

import jax
import numpy as np

from threepu.data import DeviceDataset, curriculum_state
from threepu.data.prefetch import Prefetcher
from threepu.io import load_checkpoint, import_pth
from threepu.models import Net
from threepu.train.model import (create_train_state, make_optimizer,
                                 train_step, loss_weight)
from threepu.utils import logger


@dataclasses.dataclass
class TrainConfig:
    h5_data: str
    num_shape_point: int
    num_point: Optional[int] = None       # patch size (NUM_POINT)
    batch_size: int = 16
    up_ratio: int = 16
    step_ratio: int = 2
    knn: int = 32
    growth_rate: int = 12
    dense_n: int = 3
    fm_knn: int = 5
    max_num_point: int = 312
    lr_init: float = 5e-4
    max_epoch: int = 160
    stage_steps: int = 15000
    cd_threshold: float = 2.0
    jitter: bool = False
    jitter_sigma: float = 0.0025
    jitter_max: float = 0.005
    drop_out: float = 1.0
    ckpt: Optional[str] = None
    model_dir: str = "./model/demo"
    ckpt_epochs: int = 20                 # main.py:208
    log_steps: int = 50                   # main.py:183
    seed: int = 0
    weight_mode: str = "floored"
    mesh: Optional[object] = None         # jax Mesh for multi-chip DP
    log_with_pred: bool = True            # log steps run the with_pred
    #   program variant so the monitor can plot predictions
    #   (main.py:184-195).  Each (ratio, threshold) combo then compiles
    #   a SECOND full train program — up to 2x the remote-compile bill
    #   (60-400 s/program through axon).  Rate/throughput harnesses that
    #   only read losses set False (benchmarks/train_production.py).
    ckpt_format: str = "npz"              # "npz" | "pth" (reference
    #                                       {label}_{epoch}.pth files,
    #                                       utils/pytorch_utils.py:7-15)

    @property
    def patch_point(self) -> int:
        return self.num_point or int(self.num_shape_point * self.drop_out)


def build_net(cfg: TrainConfig) -> Net:
    return Net(max_up_ratio=cfg.up_ratio, step_ratio=cfg.step_ratio,
               knn=cfg.knn, growth_rate=cfg.growth_rate,
               dense_n=cfg.dense_n, fm_knn=cfg.fm_knn,
               max_num_point=cfg.max_num_point)


def save_epoch_checkpoint(cfg: TrainConfig, state, step: int,
                          epoch: int) -> str:
    """Write the epoch checkpoint with the reference's
    ``{label}_{epoch}`` naming (``utils/pytorch_utils.py:7-15``,
    ``main.py:208-211``): native ``model_{epoch}.npz`` by default, or a
    reference-loadable ``model_{epoch}.pth`` with
    ``cfg.ckpt_format == "pth"``."""
    params_host = jax.device_get(state.params)
    if cfg.ckpt_format == "pth":
        from threepu.io import save_pth
        return save_pth(cfg.model_dir, {"params": params_host},
                        step=step, label="model", epoch=epoch)
    path = os.path.join(cfg.model_dir, f"model_{epoch}.npz")
    from threepu.io import save_train_checkpoint
    save_train_checkpoint(path, {"params": params_host},
                          jax.device_get(state.opt_state), step=step)
    return path


def train_loop(cfg: TrainConfig, max_steps: Optional[int] = None,
               log_fn: Optional[Callable] = None):
    """Run training; returns the final (state, error_log).

    ``max_steps`` bounds total optimization steps (tests/benchmarks);
    ``log_fn(step, ratio, loss, state, batch)`` is the visualization hook
    (the visdom monitor of ``main.py:183-201`` plugs in here).
    """
    net = build_net(cfg)
    tx = make_optimizer(cfg.lr_init)
    dataset = DeviceDataset(
        cfg.h5_data, cfg.num_shape_point, cfg.patch_point,
        batch_size=cfg.batch_size, up_ratio=cfg.up_ratio,
        step_ratio=cfg.step_ratio, jitter=cfg.jitter,
        jitter_sigma=cfg.jitter_sigma, jitter_max=cfg.jitter_max,
        drop_out=cfg.drop_out)

    key = jax.random.PRNGKey(cfg.seed)
    key, k_init, k_data = jax.random.split(key, 3)
    ex_in, ex_gt = dataset.sample(k_data, 0, cfg.up_ratio)
    state = create_train_state(net, k_init, ex_in, ex_gt, cfg.up_ratio,
                               tx=tx)

    step = 0
    if cfg.ckpt:
        loader = import_pth if cfg.ckpt.endswith(".pth") else load_checkpoint
        restored, step = loader(cfg.ckpt, {"params": state.params})
        opt_state = state.opt_state
        if not cfg.ckpt.endswith(".pth"):
            from threepu.io import load_opt_state
            stored = load_opt_state(cfg.ckpt, state.opt_state)
            if stored is not None:
                opt_state = stored
                logger.info("restored optimizer state (exact resume)")
        state = state._replace(params=restored["params"],
                               opt_state=opt_state,
                               step=jax.numpy.asarray(step, "int32"))
        logger.info(f"restored {cfg.ckpt} at step {step}")

    sharded_step = None
    if cfg.mesh is not None:
        from threepu.parallel import make_sharded_train_step
        sharded_step = make_sharded_train_step(net, tx, cfg.mesh)
        state = jax.device_put(
            state, jax.sharding.NamedSharding(
                cfg.mesh, jax.sharding.PartitionSpec()))

    steps_per_epoch = 300 * cfg.batch_size        # data.py:46-47
    start_epoch = step // steps_per_epoch
    error_log = defaultdict(float)

    # Deferred loss fetches: the reference updates its running-mean
    # error log every step (model.py:74-76), which on torch is a free
    # host read but through the axon tunnel costs a device round trip
    # per step — measured 17 steps/s against the 42.7 steps/s pipelined
    # ceiling (benchmarks/RESULTS.md).  Buffer the device scalars and
    # fetch them as ONE stacked transfer every ``log_steps`` (and at
    # epoch/return boundaries), replaying the running-mean updates in
    # order — bit-identical error_log, ~no per-step sync.
    pending = []                     # (key, weight, denom, device_cd)

    def flush():
        if not pending:
            return None
        vals = np.asarray(jax.numpy.stack([p[3] for p in pending]))
        for (k, w, denom, _), v in zip(pending, vals):
            prev = error_log[k]
            error_log[k] = prev + (float(v) * w - prev) / denom
        pending.clear()
        return float(vals[-1])

    def ratio_for(s: int) -> int:
        st = curriculum_state(s, cfg.stage_steps, cfg.up_ratio,
                              cfg.step_ratio, cfg.cd_threshold)
        rng = np.random.default_rng(cfg.seed * 1_000_003 + s)
        return st.choose_ratio(rng)

    key, k_pf = jax.random.split(key)
    prefetch = Prefetcher(dataset.sample, ratio_for, k_pf, depth=2,
                          start_step=step)

    t0 = time.time()
    # Epochs are labeled 1..max_epoch: the first checkpoint lands at
    # epoch ckpt_epochs like the reference (no spurious model_0 save).
    # Documented deviation: the reference's ``range(start_epoch + 1,
    # MAX_EPOCH)`` (main.py:161) runs MAX_EPOCH - 1 epochs for a fresh
    # run — an off-by-one against its own --max_epoch flag; here
    # max_epoch means what it says.
    for epoch in range(start_epoch + 1, cfg.max_epoch + 1):
        for _ in range(steps_per_epoch):
            if max_steps is not None and step >= max_steps:
                flush()
                return state, error_log
            (inp, gt), ratio, _ = next(prefetch)
            st = curriculum_state(step, cfg.stage_steps, cfg.up_ratio,
                                  cfg.step_ratio, cfg.cd_threshold)
            # pure function of the step (not a split chain): together
            # with the step-keyed Prefetcher and the full-state
            # checkpoint this makes resume bit-exact
            k_step = jax.random.fold_in(key, step)
            # log steps run the with_pred program variant so the monitor
            # can plot the actual prediction (main.py:184-195) — both
            # serial and sharded steps support it
            log_now = (log_fn is not None and cfg.log_with_pred
                       and (step + 1) % cfg.log_steps == 0)
            pred = gt_out = None
            step_fn = sharded_step or train_step
            if log_now:
                state, cd, (pred, gt_out) = step_fn(
                    net, tx, state, k_step, inp, gt, ratio,
                    threshold=st.threshold, weight_mode=cfg.weight_mode,
                    with_pred=True)
            else:
                state, cd = step_fn(net, tx, state, k_step, inp, gt,
                                    ratio, threshold=st.threshold,
                                    weight_mode=cfg.weight_mode)
            step += 1
            w = loss_weight(ratio, cfg.up_ratio, cfg.step_ratio,
                            cfg.weight_mode)
            k = f"cd_loss_x{ratio}"
            # step was already incremented: on the k-th optimizer step
            # the denominator is k, matching the reference's pre-
            # increment ``step + 1`` (model.py:66,76)
            pending.append((k, w, step, cd))
            if step % cfg.log_steps == 0:
                last_cd = flush()
                if log_fn is not None:
                    log_fn(step, ratio, last_cd, state, (inp, gt),
                           pred=pred, gt_out=gt_out, error=error_log[k])

        flush()
        logger.info(
            f"epoch {epoch}: " + ", ".join(
                f"{k}={v:.6f}" for k, v in sorted(error_log.items()))
            + f" ({(time.time() - t0):.1f}s)")
        if epoch % cfg.ckpt_epochs == 0:
            path = save_epoch_checkpoint(cfg, state, step, epoch)
            logger.info(f"saved {path}")
    # Always checkpoint the completed run (intended-behaviour fix: the
    # reference only saves every 20 epochs, so its final 160-epoch run
    # silently loses everything after epoch 140, main.py:208-211).
    if start_epoch < cfg.max_epoch and cfg.max_epoch % cfg.ckpt_epochs:
        path = save_epoch_checkpoint(cfg, state, step, cfg.max_epoch)
        logger.info(f"saved {path} (final)")
    return state, error_log
