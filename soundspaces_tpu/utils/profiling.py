"""Phase timing + profiler hooks.

Reference instrumentation splits wall-clock into pth_time (model) and
env_time (sim) per rollout step and logs fps (av_nav/ppo/ppo_trainer.py:
126-155, 361-373). In the fused design env+model run inside one XLA
program, so the equivalents are: per-phase host timers around dispatch
boundaries, fps counters (train/trainer.py), and `jax.profiler` traces for
on-device breakdowns."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimers:
    """Accumulating named wall-clock timers (the pth_time/env_time ledger)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def summary(self) -> dict[str, float]:
        return dict(self.totals)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace when a log dir is given; no-op otherwise. (On
    backends without profiler support this degrades to host-only traces.)"""
    import jax

    if not log_dir:
        yield
        return
    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception:
        yield
