"""Optimizer + loss orchestration.

Reference equivalent: ``model.py`` (component P4) — Adam(lr, 0.9/0.999),
gradient value-clipping at 1.0, per-ratio Chamfer loss weighting, and a
running-mean error log.  Here the whole step (forward, loss, backward,
clip, update) is one donated jit program per (ratio, threshold) variant.

Loss weighting: the reference computes
``weight = log(max_up_ratio / up_ratio, step_ratio)``
(``model.py:72``), which is **zero at the maximum ratio** — level 4 of a
16x net would never receive gradient, since it only runs in 16x batches.
The released checkpoints come from the TF original, so we treat this as
a latent bug and default to the *floored* weight
``max(1, log_step(max/r))`` (mode ``"floored"``); mode ``"reference"``
reproduces the exact reference behaviour.
"""

from __future__ import annotations

import math
from collections import defaultdict
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from threepu.losses import chamfer_loss

Array = jax.Array


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Array  # int32 scalar


def make_optimizer(lr: float = 5e-4) -> optax.GradientTransformation:
    """Adam with element-wise gradient value clipping at 1.0
    (``model.py:21-23,64``: clip_grad_value_(params, 1) then Adam)."""
    return optax.chain(optax.clip(1.0), optax.adam(lr, b1=0.9, b2=0.999))


def loss_weight(ratio: int, max_up_ratio: int, step_ratio: int,
                mode: str = "floored") -> float:
    w = math.log(max_up_ratio / ratio, step_ratio)
    if mode == "floored":
        return max(1.0, w)
    if mode == "reference":
        return w
    raise ValueError(f"unknown loss_weight mode {mode!r}")


def create_train_state(net, key: Array, example_input: Array,
                       example_gt: Array, ratio: int,
                       lr: float = 5e-4,
                       tx: Optional[optax.GradientTransformation] = None
                       ) -> TrainState:
    k_param, k_patch = jax.random.split(key)
    variables = net.init({"params": k_param, "patch": k_patch},
                         example_input, ratio, example_gt, train=True)
    params = variables["params"]
    tx = tx or make_optimizer(lr)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.asarray(0, jnp.int32))


@partial(jax.jit, static_argnames=("net", "tx", "ratio", "threshold",
                                   "weight_mode", "with_pred"),
         donate_argnames=("state",))
def train_step(net, tx, state: TrainState, key: Array,
               input_patches: Array, gt_patches: Array, ratio: int,
               threshold: Optional[float] = None,
               weight_mode: str = "floored",
               with_pred: bool = False):
    """One optimization step (``model.py:53-66``).

    input (B, K, 3), gt (B, rK, 3) channels-last.  Returns the new state
    and the *unweighted* Chamfer loss (the reference logs the weighted
    one; both derive from the returned value and the static weight).
    With ``with_pred`` additionally returns ``(pred, gt_out)`` from the
    training forward — the reference's ``model.predicted`` /
    ``model.gt`` that the visdom monitor plots every 50 steps
    (``main.py:184-195``); a separate compiled variant used only on log
    steps.
    """
    weight = loss_weight(ratio, net.max_up_ratio, net.step_ratio,
                         weight_mode)

    def loss_fn(params):
        pred, gt_out = net.apply({"params": params}, input_patches, ratio,
                                 gt_patches, train=True,
                                 rngs={"patch": key})
        cd = chamfer_loss(pred, gt_out, threshold=threshold)
        return cd * weight, (cd, pred, gt_out)

    (_, (cd, pred, gt_out)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(new_params, new_opt, state.step + 1)
    if with_pred:
        return new_state, cd, (pred, gt_out)
    return new_state, cd


class Model:
    """Stateful wrapper mirroring the reference ``Model`` API
    (``model.py:11-81``): ``set_input`` / ``optimize`` /
    ``compute_chamfer_loss`` plus the running-mean ``error_log``
    (``model.py:74-76``)."""

    def __init__(self, net, phase: str, lr_init: float = 5e-4,
                 ckpt: Optional[str] = None, seed: int = 0,
                 weight_mode: str = "floored"):
        self.net = net
        self.phase = phase
        self.weight_mode = weight_mode
        self.error_log = defaultdict(float)
        self.chamfer_threshold: Optional[float] = None
        self._key = jax.random.PRNGKey(seed)
        self.tx = make_optimizer(lr_init) if phase == "train" else None
        self.state: Optional[TrainState] = None
        self.step = 0
        self._pending_ckpt = ckpt
        self._input = self._gt = None
        self.up_ratio = None
        self.predicted = None

    # curriculum hooks (mirrors chamfer_criteria.set_threshold usage)
    def set_threshold(self, value: float) -> None:
        self.chamfer_threshold = value

    def unset_threshold(self) -> None:
        self.chamfer_threshold = None

    def set_input(self, input_pc, up_ratio: int, label_pc=None) -> None:
        """Accepts the reference's (B, 3, N) layout or channels-last."""
        self._input = _to_channels_last(input_pc)
        self._gt = _to_channels_last(label_pc) if label_pc is not None \
            else None
        self.up_ratio = int(up_ratio)

    def _ensure_state(self) -> None:
        if self.state is None:
            self._key, sub = jax.random.split(self._key)
            self.state = create_train_state(
                self.net, sub, self._input, self._gt, self.up_ratio,
                tx=self.tx)
            if self._pending_ckpt is not None:
                from threepu.io import load_checkpoint, import_pth
                loader = import_pth if self._pending_ckpt.endswith(".pth") \
                    else load_checkpoint
                restored, step = loader(self._pending_ckpt,
                                        {"params": self.state.params})
                self.state = self.state._replace(
                    params=restored["params"],
                    step=jnp.asarray(step, jnp.int32))
                self.step = step
                self._pending_ckpt = None

    def optimize(self) -> float:
        """Forward + backward + clip + Adam step (``model.py:53-66``);
        updates the running-mean error log and returns the weighted
        Chamfer loss."""
        self._ensure_state()
        self._key, sub = jax.random.split(self._key)
        self.state, cd = train_step(
            self.net, self.tx, self.state, sub, self._input, self._gt,
            self.up_ratio, threshold=self.chamfer_threshold,
            weight_mode=self.weight_mode)
        self.step += 1
        weighted = float(cd) * loss_weight(
            self.up_ratio, self.net.max_up_ratio, self.net.step_ratio,
            self.weight_mode)
        k = f"cd_loss_x{self.up_ratio}"
        prev = self.error_log[k]
        # self.step was already incremented: on the k-th optimize()
        # this divides by k, matching the reference's pre-increment
        # ``self.step + 1`` (model.py:66,76)
        self.error_log[k] = prev + (weighted - prev) / self.step
        return weighted

    def forward(self):
        """Inference forward on the current input."""
        self._ensure_state()
        self.predicted = self.net.apply(
            {"params": self.state.params}, self._input, self.up_ratio,
            train=False)
        return self.predicted

    def test_model(self):
        """Eval-mode forward (reference ``model.py:79-81``)."""
        return self.forward()


def _to_channels_last(x):
    x = jnp.asarray(x)
    if x.ndim == 3 and x.shape[1] == 3 and x.shape[2] != 3:
        x = jnp.swapaxes(x, 1, 2)
    return x
