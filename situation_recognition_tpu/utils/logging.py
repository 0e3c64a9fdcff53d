"""Metric formatting (reference-identical stdout) + step timing/profiling.

``format_dict`` reproduces ``/root/reference/utils/utils.py:34-42`` byte-for-
byte: the training/eval printouts are a CLI parity requirement (BASELINE.md).
The profiler hooks are new capability the reference lacks (SURVEY §5a).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


def format_dict(d: Dict[str, float], s: str, p: str) -> str:
    """'<p><key>: <s.format(v*100)>' joined by ', ' (reference format)."""
    rv = ""
    for (k, v) in d.items():
        if len(rv) > 0:
            rv += ", "
        rv += p + str(k) + ": " + s.format(v * 100)
    return rv


class StepTimer:
    """Images/sec + step-time tracking (skips warmup/compile steps)."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self.reset()

    def reset(self) -> None:
        self._steps = 0
        self._images = 0
        self._time = 0.0
        self._last: Optional[float] = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def stop(self, num_images: int) -> float:
        if self._last is None:
            raise RuntimeError("StepTimer.stop() without a matching "
                               "start() (or after reset())")
        dt = time.perf_counter() - self._last
        self._steps += 1
        if self._steps > self.warmup_steps:
            self._images += num_images
            self._time += dt
        return dt

    def lap(self, num_images: int) -> float:
        """Interval timing for PIPELINED loops (steps consumed out of
        lockstep with their dispatch): each call records the time since
        the previous ``lap`` as one step of ``num_images``.  The first
        lap after a ``reset`` only arms the clock (compile/warmup of the
        first step never pollutes the rate), and ``warmup_steps`` more
        are skipped on top, mirroring ``start``/``stop``."""
        now = time.perf_counter()
        if self._last is None:
            self._last = now
            self._steps += 1
            return 0.0
        dt = now - self._last
        self._last = now
        self._steps += 1
        if self._steps > self.warmup_steps:
            self._images += num_images
            self._time += dt
        return dt

    @property
    def images_per_sec(self) -> float:
        return self._images / self._time if self._time > 0 else 0.0

    @property
    def mean_step_time(self) -> float:
        n = self._steps - self.warmup_steps
        return self._time / n if n > 0 else 0.0


@contextlib.contextmanager
def jax_profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Optional jax.profiler trace around a region (None = no-op)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
