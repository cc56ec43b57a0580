"""Preemption handling and multi-host initialization.

Reference: savi/ddppo/algo/ddp_utils.py:40-119 + slurm_utils.py — SLURM
signal handlers (SIGUSR1 -> snapshot + requeue; SIGINT/TERM/USR2 -> clean
exit), an atomic interrupted-state file at a job-keyed path, and TCPStore
rendezvous. TPU-native: `jax.distributed.initialize` replaces the TCPStore,
and the snapshot is an orbax checkpoint of {params, opt_state, carry-free
metadata} written from the signal handler's request flag at the next update
boundary (signal handlers must not interrupt an XLA execution mid-flight).
"""

from __future__ import annotations

import os
import signal
import subprocess
from typing import Any, Callable

EXIT_REQUESTED = False
REQUEUE_REQUESTED = False


def add_signal_handlers() -> None:
    """SIGUSR1 -> save+requeue at the next update; SIGUSR2/INT/TERM -> clean
    exit at the next update (ddp_utils.py:40-64)."""

    def _requeue(signum, frame):
        global EXIT_REQUESTED, REQUEUE_REQUESTED
        EXIT_REQUESTED = True
        REQUEUE_REQUESTED = True

    def _clean_exit(signum, frame):
        global EXIT_REQUESTED
        EXIT_REQUESTED = True

    signal.signal(signal.SIGUSR1, _requeue)
    signal.signal(signal.SIGUSR2, _clean_exit)
    signal.signal(signal.SIGTERM, _clean_exit)


def interrupted_state_path(model_dir: str) -> str:
    """Job-keyed snapshot location (ddp_utils.py:67-75 uses
    $HOME/.interrupted_states/$SLURM_JOBID.pth; model-dir-relative like
    slurm_utils.py when no job id)."""
    job = os.environ.get("SLURM_JOB_ID")
    if job:
        base = os.path.join(
            os.path.expanduser("~"), ".interrupted_states"
        )
        os.makedirs(base, exist_ok=True)
        return os.path.join(base, f"{job}.ckpt")
    return os.path.join(model_dir, "interrupted_state.ckpt")


def save_interrupted_state(model_dir: str, state: dict[str, Any]) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(interrupted_state_path(model_dir))
    ocp.PyTreeCheckpointer().save(path, state, force=True)
    return path


def load_interrupted_state(model_dir: str, template: dict[str, Any]):
    import orbax.checkpoint as ocp

    path = os.path.abspath(interrupted_state_path(model_dir))
    if not os.path.exists(path):
        return None
    return ocp.PyTreeCheckpointer().restore(path, item=template)


def requeue_job() -> None:
    """`scontrol requeue` the current SLURM job (ddp_utils.py:106-119)."""
    job = os.environ.get("SLURM_JOB_ID")
    if job and os.environ.get("SLURM_PROCID", "0") == "0":
        subprocess.run(["scontrol", "requeue", job], check=False)


def init_distributed() -> tuple[int, int]:
    """Multi-host initialization: (process_index, process_count).

    The reference rendezvouses torch.distributed over a TCPStore with
    LOCAL_RANK/SLURM_* env parsing (ddp_utils.py:126-174). JAX pods carry
    coordinator config in the environment; with none present this is the
    single-process fallback the reference also has ("this is nice for
    testing", ddp_utils.py:161-165)."""
    import jax

    if (
        os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("SLURM_NTASKS", "1") not in ("", "1")
    ):
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()
