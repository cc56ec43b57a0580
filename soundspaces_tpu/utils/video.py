"""Evaluation video generation with frame-aligned audio.

Reference: ss_baselines/common/utils.py:279-318 builds demo videos by
attaching per-step audio clips to frames with moviepy (ffmpeg). This build
ships its own muxer: `mux_avi` writes ONE standard AVI file with the
uncompressed video stream and the PCM audio track interleaved
frame-by-frame (RIFF 'AVI ' with avih/strl headers, '00db'/'01wb' movi
chunks and an idx1 index) — no ffmpeg/moviepy dependency, frame-aligned by
construction."""

from __future__ import annotations

import os
import struct

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def mux_avi(
    images: list[np.ndarray],  # [H, W, 3] uint8 RGB per frame
    audio: np.ndarray,  # [total_samples, 2] int16 PCM
    path: str,
    fps: int,
    sampling_rate: int,
) -> str:
    """Write one AVI file with interleaved uncompressed ('DIB ') video and
    16-bit stereo PCM audio — each video frame followed by its audio window,
    so players keep picture and sound aligned (the images_to_video_with_audio
    contract, common/utils.py:279-318)."""
    h, w = images[0].shape[:2]
    n_frames = len(images)
    row_bytes = (w * 3 + 3) & ~3  # BMP rows pad to 4 bytes
    frame_bytes = row_bytes * h
    audio = np.asarray(audio, np.int16)
    block_align = 4  # 2 ch x int16
    samples_per_frame = sampling_rate // fps

    avih = struct.pack(
        "<14I",
        int(1e6 / fps), frame_bytes * fps + sampling_rate * block_align,
        0, 0x110,  # AVIF_HASINDEX | AVIF_ISINTERLEAVED
        n_frames, 0, 2, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh_v = (
        b"vids" + b"DIB " + struct.pack(
            "<10I4h", 0, 0, 0, 1, fps, 0, n_frames, frame_bytes,
            0xFFFFFFFF, 0, 0, 0, w, h,
        )
    )
    strf_v = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    strh_a = (
        b"auds" + b"\x00" * 4 + struct.pack(
            "<10I4h", 0, 0, 0, 1, sampling_rate, 0, audio.shape[0],
            sampling_rate * block_align, 0xFFFFFFFF, block_align, 0, 0, 0, 0,
        )
    )
    strf_a = struct.pack(
        "<HHIIHH", 1, 2, sampling_rate, sampling_rate * block_align,
        block_align, 16,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh_v) + _chunk(b"strf", strf_v))
        + _list(b"strl", _chunk(b"strh", strh_a) + _chunk(b"strf", strf_a)),
    )

    movi_payload = b""
    index = b""
    for i, frame in enumerate(images):
        # BMP layout: bottom-up rows, BGR, 4-byte row padding
        bgr = np.ascontiguousarray(frame[::-1, :, ::-1]).astype(np.uint8)
        rows = np.zeros((h, row_bytes), np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        vdata = rows.tobytes()
        index += b"00db" + struct.pack(
            "<3I", 0x10, 4 + len(movi_payload), len(vdata)
        )
        movi_payload += _chunk(b"00db", vdata)
        a0 = i * samples_per_frame
        adata = audio[a0 : a0 + samples_per_frame].tobytes()
        index += b"01wb" + struct.pack(
            "<3I", 0x10, 4 + len(movi_payload), len(adata)
        )
        movi_payload += _chunk(b"01wb", adata)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(b"idx1", index)

    riff = _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)
    with open(path, "wb") as f:
        f.write(riff)
    return path


def images_to_video_with_audio(
    images: list[np.ndarray],
    audios: list[np.ndarray],
    output_dir: str,
    video_name: str,
    sampling_rate: int,
    fps: int = 1,
) -> str:
    """images: [H, W, 3] uint8 per step; audios: [2, sr/fps] per step.
    Writes ONE muxed {name}.avi whose audio track is the per-frame windows
    concatenated in frame order (frame-aligned like the reference's
    images_to_video_with_audio, common/utils.py:279-318)."""
    os.makedirs(output_dir, exist_ok=True)
    video_path = os.path.join(output_dir, f"{video_name}.avi")

    samples_per_frame = sampling_rate // fps
    track = np.concatenate(
        [np.asarray(a)[:, :samples_per_frame].T for a in audios], axis=0
    )
    peak = np.abs(track).max() or 1.0
    pcm = (track / peak * 32767).astype(np.int16)
    return mux_avi(list(images), pcm, video_path, fps, sampling_rate)


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


# RGB colors for map cells (plot_top_down_map role,
# ss_baselines/common/utils.py:231-276)
_MAP_BLOCKED = np.array([40, 40, 48], np.uint8)
_MAP_WALKABLE = np.array([235, 235, 235], np.uint8)
_MAP_TRAIL = np.array([120, 170, 255], np.uint8)
_MAP_GOAL = np.array([40, 200, 80], np.uint8)
_MAP_AGENT = np.array([220, 50, 50], np.uint8)


def plot_top_down_map(
    occupancy: np.ndarray,  # [Gz, Gx] 1.0 = walkable
    agent_xz: tuple[int, int],
    rot_idx: int,
    goal_xz: tuple[int, int] | None = None,
    trail: list[tuple[int, int]] | None = None,
    scale: int = 4,
) -> np.ndarray:
    """Top-down map image [Gz*scale, Gx*scale, 3] uint8: walkable cells
    light, blocked dark, optional trail, goal dot, and an agent arrow
    pointing along the heading (plot_top_down_map + agent-sprite drawing,
    ss_baselines/common/utils.py:231-276)."""
    occ = np.asarray(occupancy)
    img = np.where(occ[..., None] > 0.5, _MAP_WALKABLE, _MAP_BLOCKED)
    img = img.astype(np.uint8).repeat(scale, axis=0).repeat(scale, axis=1)
    h, w = img.shape[:2]

    def disk(cx, cz, r, color):
        z0, z1 = max(cz - r, 0), min(cz + r + 1, h)
        x0, x1 = max(cx - r, 0), min(cx + r + 1, w)
        zz, xx = np.mgrid[z0:z1, x0:x1]
        mask = (zz - cz) ** 2 + (xx - cx) ** 2 <= r * r
        img[z0:z1, x0:x1][mask] = color

    mid = scale // 2
    for gx, gz in trail or []:
        disk(gx * scale + mid, gz * scale + mid, max(scale // 3, 1), _MAP_TRAIL)
    if goal_xz is not None:
        disk(goal_xz[0] * scale + mid, goal_xz[1] * scale + mid,
             max(scale // 2, 2), _MAP_GOAL)
    ax, az = agent_xz[0] * scale + mid, agent_xz[1] * scale + mid
    disk(ax, az, max(scale // 2, 2), _MAP_AGENT)
    # heading arrow: rot 0 faces -x in mesh frame (270 deg - 90*rot)
    ang = np.deg2rad(270.0 - 90.0 * rot_idx)
    for t in range(scale * 2):
        px = int(round(ax + np.cos(ang) * t))
        pz = int(round(az + np.sin(ang) * t))
        if 0 <= pz < h and 0 <= px < w:
            img[pz, px] = _MAP_AGENT
    return img


def top_down_map_from_state(scene, state, env_index: int = 0,
                            trail: list | None = None,
                            scale: int = 4) -> np.ndarray:
    """Render the map for one env of a batched EnvState over a DeviceScene."""
    node = int(np.asarray(state.node)[env_index])
    goal = int(np.asarray(state.goal_node)[env_index])
    rot = int(np.asarray(state.rot_idx)[env_index])
    xz = np.asarray(scene.node_grid_xz)
    return plot_top_down_map(
        np.asarray(scene.occupancy),
        (int(xz[node, 0]), int(xz[node, 1])),
        rot,
        goal_xz=(int(xz[goal, 0]), int(xz[goal, 1])),
        trail=trail,
        scale=scale,
    )
