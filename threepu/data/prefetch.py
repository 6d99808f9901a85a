"""Asynchronous batch prefetching.

Capability twin of the reference's unused custom multiprocess loader
(``utils/multiproc_dataloader.py``, component P16): producing batches
ahead of the consumer with the curriculum scale synchronized per batch.
On TPU the sampling itself is an async on-device XLA program, so
"prefetch" means keeping ``depth`` sample programs in flight while the
train step runs — no worker processes, no host copies.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Iterator, Tuple

import jax


class Prefetcher:
    """Keeps ``depth`` batches in flight.

    ``sample_fn(key, step, ratio)`` must return device arrays (e.g.
    :meth:`threepu.data.DeviceDataset.sample`); ``ratio_fn(step)``
    chooses the curriculum scale per batch (host-side, it selects the
    compiled program variant).
    """

    def __init__(self, sample_fn: Callable, ratio_fn: Callable[[int], int],
                 key: jax.Array, depth: int = 2, start_step: int = 0):
        self.sample_fn = sample_fn
        self.ratio_fn = ratio_fn
        self.depth = depth
        self._key = key
        self._step = start_step
        self._queue: deque = deque()

    def _issue(self) -> None:
        # key is a pure function of the step (not a split chain), so a
        # resumed run issues bit-identical batches from start_step on
        sub = jax.random.fold_in(self._key, self._step)
        ratio = int(self.ratio_fn(self._step))
        batch = self.sample_fn(sub, self._step, ratio)
        self._queue.append((batch, ratio, self._step))
        self._step += 1

    def __iter__(self) -> Iterator[Tuple[tuple, int, int]]:
        return self

    def __next__(self):
        while len(self._queue) < self.depth:
            self._issue()
        return self._queue.popleft()
