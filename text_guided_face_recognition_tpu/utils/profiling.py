"""Tracing / profiling hooks (capability upgrade — SURVEY.md §5: the reference
has no tracing at all, only tqdm bars).

Usage in train loops:
    with maybe_profile(args, step):   # traces steps [start, start+num) when
        state, metrics = train_step(...)   # profile_dir is set

plus `nan_guard(metrics)` for fail-fast NaN/Inf detection on loss aggregates.
"""

from __future__ import annotations

import contextlib
import os
from typing import Dict, Optional

import jax
import numpy as np

__all__ = ["maybe_profile", "StepTimer", "nan_guard"]


@contextlib.contextmanager
def maybe_profile(args, step: int):
    """Wrap a step in a jax.profiler trace when `profile_dir` is configured
    and step is in [profile_start, profile_start + profile_steps)."""
    profile_dir = getattr(args, "profile_dir", None)
    start = int(getattr(args, "profile_start", 5))
    num = int(getattr(args, "profile_steps", 3))
    if profile_dir and start <= step < start + num:
        if step == start:
            jax.profiler.start_trace(os.path.expanduser(profile_dir))
        try:
            yield
        finally:
            if step == start + num - 1:
                jax.profiler.stop_trace()
                print(f"profiler trace written to {profile_dir}")
    else:
        yield


class StepTimer:
    """Wall-clock per-step timing with warmup exclusion."""

    def __init__(self, warmup: int = 2):
        import time
        self._time = time.perf_counter
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = self._time()
        return self

    def __exit__(self, *exc):
        dt = self._time() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt

    @property
    def mean(self) -> float:
        n = max(self.count - self.warmup, 1)
        return self.total / n


def nan_guard(metrics: Dict[str, object], step: int = -1) -> None:
    """Fail fast on non-finite loss aggregates (the reference would silently
    continue training on NaN)."""
    for k, v in metrics.items():
        val = float(np.asarray(v)) if not isinstance(v, (int, float)) else v
        if isinstance(val, float) and not np.isfinite(val):
            raise FloatingPointError(
                f"non-finite metric {k!r}={val} at step {step}")
