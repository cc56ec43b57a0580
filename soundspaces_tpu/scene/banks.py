"""HBM-resident asset banks: RIRs, source sounds, cached visual frames.

Replaces the reference's per-step host I/O — `wavfile.read` of
`binaural_rirs/{scene}/{azimuth}/{receiver}_{source}.wav`
(soundspaces/simulator.py:614-618), `librosa.load` of source sounds
(simulator.py:595-600), and the pickled frame cache
(simulator.py:367-369) — with fixed-shape arrays uploaded once.

Shapes:
- rir:      [4, N_nodes, G, 2, rir_max_len]  (azimuth, receiver, goal slot)
- seg_fft:  [S, max_secs, F] complex64 precomputed source-segment spectra
- frames:   [N_nodes, 4, H, W, C] per visual modality

Goal slots: an episode's source (goal) position is one of a small set of
nodes G << N, so the bank is indexed by a dense goal-slot axis instead of a
full N x N pose product; `goal_slot_of_node` maps node id -> slot.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import numpy as np

from soundspaces_tpu.ops.convolve import min_fft_size, precompute_segment_ffts
from soundspaces_tpu.ops.partitioned import (
    choose_block_size,
    precompute_segment_block_ffts,
)
from soundspaces_tpu.scene.graph import SceneGraph


@dataclasses.dataclass
class AcousticBank:
    """Per-scene acoustic tensors (host numpy; upload with jax.device_put)."""

    rir: np.ndarray  # [4, N, G, 2, L] float32 (or bfloat16)
    goal_nodes: np.ndarray  # [G] int32 node id of each goal slot
    goal_slot_of_node: np.ndarray  # [N] int32, -1 if node is not a goal
    seg_fft: np.ndarray  # [S, max_secs, F] complex64 (single-FFT path)
    seg_block_fft: np.ndarray  # [S, max_secs, K, B] c64, DC/Nyquist-packed
    conv_block: int  # partition block size B
    sounds: np.ndarray  # [S, max_samples] float32 raw waveforms
    sound_lengths_sec: np.ndarray  # [S] int32
    sampling_rate: int
    rir_max_len: int

    @property
    def fft_size(self) -> int:
        return min_fft_size(self.sampling_rate, self.rir_max_len)

    @property
    def num_goals(self) -> int:
        return self.rir.shape[2]

    @classmethod
    def build(
        cls,
        graph: SceneGraph,
        rirs: np.ndarray,
        goal_nodes: np.ndarray,
        sounds: np.ndarray,
        sound_lengths_sec: np.ndarray,
        sampling_rate: int,
        max_secs: int | None = None,
    ) -> "AcousticBank":
        """rirs: [4, N, G, 2, L] zero-padded binaural impulse responses."""
        goal_nodes = np.asarray(goal_nodes, np.int32)
        slot_of = np.full(graph.num_nodes, -1, np.int32)
        slot_of[goal_nodes] = np.arange(len(goal_nodes), dtype=np.int32)
        rir_max_len = rirs.shape[-1]
        seg_fft = precompute_segment_ffts(
            sounds, sound_lengths_sec, sampling_rate, rir_max_len, max_secs
        )
        block = choose_block_size(rir_max_len)
        seg_block_fft = precompute_segment_block_ffts(
            sounds, sound_lengths_sec, sampling_rate, rir_max_len, block,
            max_secs,
        )
        return cls(
            rir=np.asarray(rirs, np.float32),
            goal_nodes=goal_nodes,
            goal_slot_of_node=slot_of,
            seg_fft=seg_fft,
            seg_block_fft=seg_block_fft,
            conv_block=block,
            sounds=np.asarray(sounds, np.float32),
            sound_lengths_sec=np.asarray(sound_lengths_sec, np.int32),
            sampling_rate=sampling_rate,
            rir_max_len=rir_max_len,
        )

    @classmethod
    def from_rir_dir(
        cls,
        graph: SceneGraph,
        binaural_rir_dir: str,
        goal_nodes: np.ndarray,
        sounds: np.ndarray,
        sound_lengths_sec: np.ndarray,
        sampling_rate: int,
        rir_max_len: int | None = None,
    ) -> "AcousticBank":
        """Ingest the reference's on-disk RIR layout:
        `{dir}/{azimuth}/{receiver}_{source}.wav` with azimuth in
        {0, 90, 180, 270} (simulator.py:614-616). Missing/empty files become
        silent RIRs, matching the reference's fallback (simulator.py:619-624).
        Filenames use the graph's ORIGINAL node ids (`graph.node_ids`) — on
        real reference metadata these are non-contiguous (adjust_graph node
        removals), while `r`/`goal_nodes` here are dense row indices.
        """
        from scipy.io import wavfile

        goal_nodes = np.asarray(goal_nodes, np.int32)
        n, g = graph.num_nodes, len(goal_nodes)
        ids = np.asarray(graph.node_ids, np.int64)
        loaded: dict[tuple[int, int, int], np.ndarray] = {}
        max_len = 0
        for ai, angle in enumerate((0, 90, 180, 270)):
            for r in range(n):
                for gi, s in enumerate(goal_nodes):
                    path = os.path.join(
                        binaural_rir_dir, str(angle), f"{ids[r]}_{ids[s]}.wav"
                    )
                    if not os.path.exists(path):
                        continue
                    try:
                        _, data = wavfile.read(path)
                    except ValueError:
                        continue
                    if data.size == 0:
                        continue
                    loaded[(ai, r, gi)] = np.asarray(data, np.float32)
                    max_len = max(max_len, data.shape[0])
        rir_max_len = rir_max_len or max(max_len, 1)
        rirs = np.zeros((4, n, g, 2, rir_max_len), np.float32)
        for (ai, r, gi), data in loaded.items():
            ln = min(data.shape[0], rir_max_len)
            rirs[ai, r, gi, :, :ln] = data[:ln].T
        return cls.build(
            graph, rirs, goal_nodes, sounds, sound_lengths_sec, sampling_rate
        )


@dataclasses.dataclass
class FrameBank:
    """Cached visual observations per (node, heading): the TPU form of the
    reference's `scene_observations/{scene}.pkl` cache keyed by
    (node, angle) (scripts/cache_observations.py:44-107)."""

    modalities: dict[str, np.ndarray]  # name -> [N, 4, H, W, C]

    @classmethod
    def from_cache_pickle(cls, path: str, num_nodes: int) -> "FrameBank":
        """Load the reference's observation-cache pickle:
        {(node, angle): {sensor: array}}."""
        import pickle

        with open(path, "rb") as f:
            cache: dict[tuple[int, int], dict[str, Any]] = pickle.load(f)
        sensors = next(iter(cache.values())).keys()
        out: dict[str, np.ndarray] = {}
        for name in sensors:
            sample = np.asarray(next(iter(cache.values()))[name])
            arr = np.zeros((num_nodes, 4) + sample.shape, sample.dtype)
            for (node, angle), obs in cache.items():
                arr[node, (angle // 90) % 4] = np.asarray(obs[name])
            out[name] = arr
        return cls(out)


@dataclasses.dataclass
class SceneAssets:
    """Everything one scene needs on device."""

    graph: SceneGraph
    acoustics: AcousticBank
    frames: FrameBank
    node_category: np.ndarray | None = None  # [N] int32 object category (semantic)
    # [max_instances] instance id -> mpcat40 id (the .house-derived mapping
    # of SemanticObjectSensor, soundspaces/tasks/nav.py:675-681)
    instance_to_mpcat: np.ndarray | None = None
