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

# The env var alone is NOT enough: the jaxtyping pytest plugin imports
# jax before this conftest runs, freezing JAX_PLATFORMS=axon (the TPU
# tunnel) into the config — tests would silently run against the TPU.
# Setting the config attribute works until a backend is initialized.
jax.config.update("jax_platforms", "cpu")

# float64 so finite-difference gradient checks are meaningful
jax.config.update("jax_enable_x64", True)
# this jax build defaults matmuls to bf16 passes (even on CPU); pin full
# precision so numpy oracles are meaningful.  Production keeps the fast
# default for network layers; geometry ops force HIGHEST internally.
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: repeat test runs skip XLA recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
