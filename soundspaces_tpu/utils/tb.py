"""TensorBoard writing, no-op when disabled.

Reference: ss_baselines/common/tensorboard_utils.py:16-70 — a SummaryWriter
wrapper that becomes a no-op when the log dir is empty, plus video logging
from frame arrays."""

from __future__ import annotations

from typing import Any

import numpy as np


class TensorboardWriter:
    def __init__(self, log_dir: str | None, flush_secs: int = 30):
        self._writer = None
        if log_dir:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(log_dir, flush_secs=flush_secs)

    def add_scalar(self, tag: str, value: float, step: int):
        if self._writer:
            self._writer.add_scalar(tag, value, step)

    def add_scalars(self, metrics: dict[str, float], step: int, prefix: str = ""):
        for k, v in metrics.items():
            self.add_scalar(f"{prefix}{k}", float(v), step)

    def add_video_from_np_images(
        self, tag: str, step: int, images: list[np.ndarray], fps: int = 10
    ):
        """images: list of [H, W, C] uint8 frames
        (tensorboard_utils.py:44-66)."""
        if not self._writer:
            return
        frames = np.stack(images)  # [T, H, W, C]
        video = frames[None].transpose(0, 1, 4, 2, 3)  # [1, T, C, H, W]
        self._writer.add_video(tag, video, step, fps=fps)

    def close(self):
        if self._writer:
            self._writer.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
