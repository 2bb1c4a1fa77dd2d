"""Profiling / tracing hooks (SURVEY.md §5.1 — absent in the reference;
first-class here).

Two levels:
  * always-on: the runner's per-iteration wall-clock + env-steps/s counters
    (Perf/total_fps in TensorBoard, matching the rsl_rl console surface)
  * on-demand: ``trace(log_dir)`` context manager wrapping
    ``jax.profiler`` so a training window can be captured and inspected in
    TensorBoard's profile plugin / xprof (device timelines, HLO op costs).

Usage:
    python -m unitree_rl_gym_tpu.scripts.train --task=go2 --profile_iters=3
captures iterations 2..4 into <log_dir>/profile.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Cheap section timer: sums wall time per named section."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        return " | ".join(
            f"{k}: {v:.3f}s/{self.counts[k]}" for k, v in self.totals.items()
        )
