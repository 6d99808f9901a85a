"""Training orchestration (maps reference layer L6: ``model.py`` and the
training half of ``main.py``)."""

from threepu.train.model import (TrainState, create_train_state, train_step,
                                 loss_weight, Model)
from threepu.train.loop import train_loop, TrainConfig

__all__ = [
    "TrainState", "create_train_state", "train_step", "loss_weight",
    "Model", "train_loop", "TrainConfig",
]
