"""Chamfer loss with curriculum outlier threshold.

Functional equivalent of the reference ``ChamferLoss``
(``network/model_loss.py:33-85``):

- bidirectional mean NN distance, forward direction weighted by
  ``forward_weight``;
- optional outlier rejection: per cloud, squared distances above
  ``threshold * mean(distance)`` are zeroed *per direction* before the
  mean (``model_loss.py:67-77``) — driven by the training curriculum via
  ``set_threshold``/``unset_threshold``.

The core is the pure function :func:`chamfer_loss` (jit/grad friendly,
threshold passed per call); :class:`ChamferLoss` is a thin stateful
wrapper mirroring the reference API surface.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from threepu.ops.chamfer import nn_distance

Array = jax.Array


def _to_points_last(x: Array) -> Array:
    """Accept (B, N, 3) or (B, 3, N), return (B, N, 3)
    (``model_loss.py:54-61``)."""
    if x.ndim != 3:
        raise ValueError(f"ChamferLoss needs a 3D tensor, got {x.shape}")
    if x.shape[2] != 3:
        if x.shape[1] != 3:
            raise ValueError("ChamferLoss is implemented for 3D points")
        x = jnp.swapaxes(x, 1, 2)
    return x


def chamfer_loss(pred: Array, gt: Array,
                 threshold: Optional[float] = None,
                 forward_weight: float = 1.0,
                 chunk: int = 2048) -> Array:
    """Scalar Chamfer loss.  ``threshold`` must be a static python float
    (or None) — it selects the compiled program variant."""
    pred = _to_points_last(pred)
    gt = _to_points_last(gt)
    pred2gt, _, gt2pred, _ = nn_distance(pred, gt, chunk)

    if threshold is not None:
        fwd_thr = jnp.mean(pred2gt, axis=1, keepdims=True) * threshold
        bwd_thr = jnp.mean(gt2pred, axis=1, keepdims=True) * threshold
        pred2gt = jnp.where(pred2gt < fwd_thr, pred2gt,
                            jnp.zeros_like(pred2gt))
        gt2pred = jnp.where(gt2pred < bwd_thr, gt2pred,
                            jnp.zeros_like(gt2pred))

    cd = forward_weight * jnp.mean(pred2gt, axis=1) + jnp.mean(gt2pred, axis=1)
    return jnp.mean(cd)


class ChamferLoss:
    """Stateful wrapper mirroring the reference module API
    (``set_threshold``/``unset_threshold`` drive the curriculum,
    ``main.py:173-182``)."""

    def __init__(self, threshold: Optional[float] = None,
                 forward_weight: float = 1.0):
        self._threshold = threshold
        self.forward_weight = forward_weight

    def set_threshold(self, value: float) -> None:
        self._threshold = value

    def unset_threshold(self) -> None:
        self._threshold = None

    @property
    def threshold(self) -> Optional[float]:
        return self._threshold

    def __call__(self, pred: Array, gt: Array) -> Array:
        return chamfer_loss(pred, gt, threshold=self._threshold,
                            forward_weight=self.forward_weight)
