"""Step timing + profiling utilities.

The reference's observability is ad-hoc time.time() deltas (SURVEY.md §5).
Here: a StepTimer tracking images/sec (the north-star counter) and an optional
jax.profiler trace context for real device profiles."""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class StepTimer:
    """Tracks steps/sec and images/sec over a sliding window."""

    def __init__(self, window: int = 50):
        self.window = window
        self._stamps = []
        self._images = []

    def tick(self, n_images: int = 0) -> None:
        self._stamps.append(time.time())
        self._images.append(n_images)
        if len(self._stamps) > self.window:
            self._stamps.pop(0)
            self._images.pop(0)

    @property
    def steps_per_sec(self) -> float:
        if len(self._stamps) < 2:
            return 0.0
        dt = self._stamps[-1] - self._stamps[0]
        return (len(self._stamps) - 1) / dt if dt > 0 else 0.0

    @property
    def images_per_sec(self) -> float:
        if len(self._stamps) < 2:
            return 0.0
        dt = self._stamps[-1] - self._stamps[0]
        return sum(self._images[1:]) / dt if dt > 0 else 0.0


@contextlib.contextmanager
def maybe_profile(logdir: Optional[str]):
    """jax.profiler trace when a directory is given, no-op otherwise."""
    if not logdir:
        yield
        return
    import jax
    with jax.profiler.trace(logdir):
        yield
