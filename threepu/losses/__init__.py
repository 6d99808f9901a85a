"""Loss functions."""

from threepu.losses.chamfer_loss import ChamferLoss, chamfer_loss

__all__ = ["ChamferLoss", "chamfer_loss"]
