"""Shared chip-job plumbing.

The chip-queue watchdog kills a job whose step log goes stale, but the
multi-GB bank upload over the axon tunnel (a few MB/s) plus the first
compile write nothing for tens of minutes — a healthy setup phase reads
as a wedge (the r4 multiscene lesson, results/R5_QUEUE.md). Every
chip-job entry point (train_eval_job, bench_realistic) prints the same
setup heartbeat through this helper so the safety window is tuned in
one place.
"""

from __future__ import annotations

import sys
import threading
import time


def start_setup_heartbeat(
    tag: str = "job",
    period_s: float = 240.0,
    cap_s: float = 5400.0,
    stream=None,
) -> threading.Event:
    """Print a heartbeat every ``period_s`` until the returned Event is
    set (callers set it at the first real log line, so genuine wedges
    stay detectable afterwards) or ``cap_s`` elapses (so a setup-phase
    wedge is still killed eventually)."""
    stop = threading.Event()
    out = stream if stream is not None else sys.stdout

    def _beat():
        t0 = time.time()
        while not stop.wait(period_s):
            dt = time.time() - t0
            if dt > cap_s:
                return
            print(
                f"[{tag}] setup heartbeat +{dt:.0f}s "
                "(bank upload / first compile)",
                file=out, flush=True,
            )

    threading.Thread(target=_beat, daemon=True).start()
    return stop
