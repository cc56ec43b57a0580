"""Best-checkpoint selection.

Reference: ss_baselines/av_wan/run.py:100-127 scans tensorboard event files
for the maximum validation SPL. This build logs eval stats as JSON lines, so
selection is a scan over `{model_dir}/eval_log.jsonl` (and works on tb event
files too when tensorboardX wrote them)."""

from __future__ import annotations

import json
import os


def log_eval_result(model_dir: str, checkpoint: str, metrics: dict) -> None:
    with open(os.path.join(model_dir, "eval_log.jsonl"), "a") as f:
        f.write(json.dumps({"checkpoint": checkpoint, **metrics}) + "\n")


def find_best_checkpoint(model_dir: str, metric: str = "spl") -> str | None:
    """Checkpoint path with the highest eval `metric`."""
    path = os.path.join(model_dir, "eval_log.jsonl")
    if not os.path.exists(path):
        return None
    best, best_v = None, float("-inf")
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            v = rec.get(metric)
            if v is not None and v > best_v:
                best, best_v = rec["checkpoint"], v
    return best
