"""Tracing and throughput measurement.

The reference's only observability is wall-clock prints around the
test loop (``main.py:363,377-378``) — SURVEY.md §5 calls for
first-class profiling in the TPU build.  This module provides:

- :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory;
- :class:`Stopwatch` — axon-safe stage timing: forces a device->host
  fetch, because under the axon tunnel ``block_until_ready`` returns
  before execution finishes and identical-input re-runs are memoized;
- :class:`ThroughputMeter` — running points/sec/chip, the north-star
  metric (BASELINE.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


def trace_supported() -> bool:
    """Whether ``jax.profiler.trace`` actually produces a trace here.
    The axon TPU tunnel executes programs on a remote server, so the
    local profiler observes nothing — callers should fall back to
    manual stage timing (:class:`Stopwatch`,
    ``benchmarks/profile_stages.py``).  Checks the *initialized*
    backend, not the env var: the axon plugin loads via a site hook
    even when ``JAX_PLATFORMS`` is unset, so the env var alone
    mispredicts in both directions.  The tunneled TPU reports itself
    as ``tpu`` (``benchmarks/tpu_checks.py`` asserts exactly that), and
    every TPU in this deployment is reached through the tunnel — local
    backends (cpu/gpu) profile fine."""
    import jax

    return jax.default_backend() not in ("tpu", "axon")


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    with jax.profiler.trace(log_dir):
        yield
    from threepu.utils import logger
    logger.info(f"profiler trace written to {log_dir}")


def force_sync(x) -> None:
    """Guarantee a device computation actually finished (fetches one
    element; see module docstring for why block_until_ready is not
    enough under the axon tunnel)."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0])


class Stopwatch:
    """Named stage timings with device synchronisation."""

    def __init__(self):
        self.stages: Dict[str, List[float]] = {}
        self._t0: Optional[float] = None
        self._name: Optional[str] = None

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        holder = {}
        yield holder
        out = holder.get("result", result)
        if out is not None:
            force_sync(out)
        self.stages.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        return {k: float(np.median(v)) for k, v in self.stages.items()}

    def report(self) -> str:
        return ", ".join(f"{k}={v * 1e3:.1f}ms"
                         for k, v in self.summary().items())


class ThroughputMeter:
    """Running upsampled-points/sec."""

    def __init__(self):
        self.points = 0
        self.seconds = 0.0

    def add(self, num_points: int, seconds: float) -> None:
        self.points += int(num_points)
        self.seconds += float(seconds)

    @property
    def points_per_sec(self) -> float:
        return self.points / self.seconds if self.seconds else 0.0
