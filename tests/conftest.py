"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding tests exercise the same code paths as multi-chip TPU."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest

# float64 so finite-difference gradient checks are meaningful
jax.config.update("jax_enable_x64", True)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
