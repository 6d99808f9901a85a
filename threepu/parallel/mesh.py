"""Device mesh helpers."""

from __future__ import annotations

from typing import Optional

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1D mesh over the first ``n_devices`` devices (patch parallelism
    is the single scaling axis — SURVEY.md §2.3: no TP/PP/EP needed for
    a 0.3M-param model)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    mesh_devices = mesh_utils.create_device_mesh(
        (len(devices),), devices=devices)
    return Mesh(mesh_devices, (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch/patch) dimension."""
    return NamedSharding(mesh, P(axis_name))
