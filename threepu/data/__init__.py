"""Data pipeline (maps reference layer L5: ``data.py`` and the unused
``utils/multiproc_dataloader.py``)."""

from threepu.data.curriculum import (stage_progress, curriculum_state,
                                     CurriculumState)
from threepu.data.h5_dataset import load_h5_data, DeviceDataset, H5Dataset
from threepu.data.augment import augment_batch
from threepu.data.prefetch import Prefetcher

__all__ = [
    "stage_progress", "curriculum_state", "CurriculumState",
    "load_h5_data", "DeviceDataset", "H5Dataset",
    "augment_batch", "Prefetcher",
]
