"""Point-cloud IO and checkpointing (maps reference layer L1:
``utils/pc_utils.py`` IO half + ``utils/pytorch_utils.py``)."""

from threepu.io.ply import (read_ply, read_ply_with_color, save_ply,
                            save_ply_property, save_ply_with_face,
                            save_ply_with_face_property)
from threepu.io.pointcloud import load, save
from threepu.io.checkpoint import (save_checkpoint, load_checkpoint,
                                   save_train_checkpoint,
                                   load_opt_state,
                                   import_pth, export_reference_state,
                                   save_pth)

__all__ = [
    "read_ply", "read_ply_with_color", "save_ply", "save_ply_property",
    "save_ply_with_face", "save_ply_with_face_property",
    "load", "save",
    "save_checkpoint", "load_checkpoint", "save_train_checkpoint",
    "load_opt_state", "import_pth",
    "export_reference_state", "save_pth",
]
