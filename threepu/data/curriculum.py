"""Progressive-training curriculum as a pure function of the step.

The reference drives the curriculum with in-place mutations on stage
transitions (``main.py:171-182``) but restores it after preemption by
*reconstructing* the whole state from the global step
(``main.py:141-156``) — proving the state is a pure function of ``step``.
This module makes that function explicit; checkpoint = {params, step} is
then sufficient for exact resume (SURVEY.md §5 checkpoint/resume).

Schedule (``main.py:118-124``): with S = stage_steps,
``stage = (step + S) // (2S)``, ``progress`` the fractional remainder;
each stage unlocks the next 2x ratio, ``progress > 0.5`` enables
combined (random-ratio) sampling, ``progress > 0.6`` enables the Chamfer
outlier threshold.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple


def stage_progress(step: int, stage_steps: int) -> Tuple[int, float]:
    """(stage, progress in [0, 1)) — ``main.py:118-124``."""
    stage = (step + stage_steps) // (2 * stage_steps)
    progress = (step + stage_steps) / (2 * stage_steps) - stage
    return int(stage), float(progress)


class CurriculumState(NamedTuple):
    stage: int
    progress: float
    scales: Tuple[int, ...]   # active ratios, e.g. (2, 4)
    combined: bool            # sample ratio uniformly from scales
    threshold: Optional[float]  # Chamfer outlier threshold or None

    @property
    def max_ratio(self) -> int:
        return self.scales[-1]

    def choose_ratio(self, rng) -> int:
        """Ratio for the next batch (``data.py:174-178``): random from
        the active scales when combined, else the newest scale."""
        if self.combined:
            return int(self.scales[int(rng.integers(len(self.scales)))])
        return int(self.scales[-1])


def curriculum_state(step: int, stage_steps: int, up_ratio: int,
                     step_ratio: int = 2,
                     cd_threshold: Optional[float] = 2.0
                     ) -> CurriculumState:
    """Full curriculum state at ``step`` (reconstruction logic of
    ``main.py:141-156`` + the transition rules of ``main.py:171-182``)."""
    num_levels = int(math.log(up_ratio, step_ratio))
    stage, progress = stage_progress(step, stage_steps)
    n_active = min(stage + 1, num_levels)
    scales = tuple(step_ratio ** r for r in range(1, n_active + 1))
    combined = progress > 0.5
    threshold = cd_threshold if progress > 0.6 else None
    return CurriculumState(stage=stage, progress=progress, scales=scales,
                           combined=combined, threshold=threshold)
