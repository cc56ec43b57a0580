"""Evaluation video generation with frame-aligned audio.

Reference: ss_baselines/common/utils.py:279-318 builds demo videos by
attaching per-step audio clips to frames with moviepy. moviepy/ffmpeg are
host-side conveniences, not compute path; this build writes the video with
cv2 and the aligned audio track as a wav (mux offline with ffmpeg where
available)."""

from __future__ import annotations

import os

import numpy as np


def images_to_video_with_audio(
    images: list[np.ndarray],
    audios: list[np.ndarray],
    output_dir: str,
    video_name: str,
    sampling_rate: int,
    fps: int = 1,
) -> tuple[str, str]:
    """images: [H, W, 3] uint8 per step; audios: [2, sr/fps] per step.
    Writes {name}.avi + {name}.wav with one audio window per frame."""
    import cv2
    from scipy.io import wavfile

    os.makedirs(output_dir, exist_ok=True)
    video_path = os.path.join(output_dir, f"{video_name}.avi")
    wav_path = os.path.join(output_dir, f"{video_name}.wav")

    h, w = images[0].shape[:2]
    writer = cv2.VideoWriter(
        video_path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h)
    )
    for frame in images:
        writer.write(frame[..., ::-1])  # RGB -> BGR
    writer.release()

    samples_per_frame = sampling_rate // fps
    track = np.concatenate(
        [np.asarray(a)[:, :samples_per_frame].T for a in audios], axis=0
    )
    peak = np.abs(track).max() or 1.0
    wavfile.write(wav_path, sampling_rate, (track / peak * 32767).astype(np.int16))
    return video_path, wav_path


def observations_to_image(obs: dict, info: dict | None = None) -> np.ndarray:
    """Tile available visual observations into one frame
    (ss_baselines/common/utils.py:490-633, simplified)."""
    tiles = []
    for name in ("rgb", "depth"):
        if name not in obs:
            continue
        img = np.asarray(obs[name])
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        tiles.append(img)
    if "spectrogram" in obs:
        spec = np.asarray(obs["spectrogram"])[..., 0]
        spec = spec / (spec.max() + 1e-6)
        img = (np.clip(spec, 0, 1) * 255).astype(np.uint8)
        h = tiles[0].shape[0] if tiles else 128
        import cv2

        img = cv2.resize(img, (h, h))[..., None].repeat(3, axis=-1)
        tiles.append(img)
    if not tiles:
        return np.zeros((64, 64, 3), np.uint8)
    h = max(t.shape[0] for t in tiles)
    padded = [
        np.pad(t, ((0, h - t.shape[0]), (0, 0), (0, 0))) for t in tiles
    ]
    return np.concatenate(padded, axis=1)
