"""Device-side data structures for the functional environment."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from soundspaces_tpu.scene.banks import SceneAssets
from soundspaces_tpu.scene.graph import UNREACHABLE


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment/task configuration (the content of the reference's
    yacs TASK_CONFIG + RL nodes that affects device computation;
    ss_baselines/av_nav/config/default.py:25-152)."""

    max_episode_steps: int = 500
    # reward shaping (ss_baselines/common/environments.py:74-91)
    slack_reward: float = -0.01
    success_reward: float = 10.0
    distance_reward_scale: float = 1.0
    with_time_penalty: bool = True
    with_distance_reward: bool = True
    # audio (ss_baselines/av_nav/config/default.py AUDIO node)
    everlasting: bool = True
    # semantic task: mix a distractor source into the audio
    # (simulator.py:649-664, semantic_audionav_task.py)
    has_distractor_sound: bool = False
    # observation suite
    sensors: tuple[str, ...] = ("spectrogram", "depth")
    num_categories: int = 21
    # SemanticObjectSensor CONVERT_TO_RGB (soundspaces/tasks/nav.py:655-661)
    semantic_to_rgb: bool = False
    # CONTINUOUS_VIEW_CHANGE (simulator.py:518-545): emit interpolated
    # intermediate frames between the previous and new pose for smooth demo
    # videos. The reference re-renders at fps-1 intermediate poses; the
    # frame-bank analog blends the cached endpoint frames.
    continuous_view_change: bool = False
    view_change_fps: int = 10
    # EgoMap source: True projects a rendered depth image through the camera
    # intrinsics (the reference's computation, nav.py:235-405 — partial
    # observability); False crops the simulator's true walkable grid (test
    # oracle)
    egomap_from_depth: bool = True
    egomap_depth_hw: int = 64  # depth-render resolution for the projection
    # episode scheduling: "random" (training) or "sequential" (eval sweeps)
    episode_sampling: str = "random"
    # which action subset the task exposes (ActionSpaceConfiguration,
    # soundspaces/tasks/action_space.py): "default" or "move-all"
    action_space: str = "default"
    # process the env batch in this many sequential chunks inside the jitted
    # step (lax.map): large audio batches lose HBM locality — 2x128-env
    # chunks measured ~40% faster than one 256-env batch on TPU v5e
    step_chunks: int = 1

    @property
    def num_actions(self) -> int:
        from soundspaces_tpu.scene.graph import ACTION_SPACES

        return len(ACTION_SPACES[self.action_space])


@struct.dataclass
class DeviceScene:
    """One scene's assets as device arrays (see scene/banks.py for shapes)."""

    points: jax.Array  # [N, 3] f32
    forward_neighbor: jax.Array  # [N, 4] i32
    geodesic_hops: jax.Array  # [N, N] i16 (UNREACHABLE = 2^15-1 fits)
    oracle_next: jax.Array  # [N, N] i16 next-hop node toward goal
    rir: jax.Array  # [4, N, G, 2, L] f32
    goal_slot_of_node: jax.Array  # [N] i32
    seg_fft: jax.Array  # [S, secs, F] c64 (single-FFT conv path)
    seg_block_fft: jax.Array  # [S, secs, K, B] c64, DC/Nyquist-packed
    sounds: jax.Array  # [S, max_samples] f32 raw waveforms (continuous mode)
    sound_lengths_sec: jax.Array  # [S] i32
    frames: dict[str, jax.Array]  # name -> [N, 4, H, W, C]
    occupancy: jax.Array  # [Gz, Gx] f32 walkable grid at egomap_resolution
    node_grid_xz: jax.Array  # [N, 2] i32 occupancy-cell coords per node
    proximity: jax.Array  # [N] f32 distance to nearest obstacle (<= 2 m cap)
    # optional precomputed RIR partition spectra: [4, N, G, 2, P, B] c64,
    # or — when rir_fft_dtype=bfloat16 — the (re, im)-pair layout
    # [2, 4, N, G, 2, P, B] bf16 with the pair on the LEADING axis
    # (ops/partitioned.spectra_to_bf16_pair). Trades 2x bank memory for
    # removing all per-step forward FFTs; index via gather_part_fft.
    rir_part_fft: jax.Array | None = None
    # wrap-extended sources [S, P*B + max_samples + tail] for the continuous
    # mode's contiguous-slice delay-line windows (extend_source_for_slicing)
    sounds_ext: jax.Array | None = None
    # continuous-mode quantized-cursor table [S, W, K, B] c64: delay-line
    # spectra at every step_window-aligned cursor — when the random initial
    # cursor is quantized to window boundaries, every per-step spectrum is a
    # GATHER from this table (no forward FFTs on the continuous hot path;
    # see env/continuous.add_step_window_table)
    seg_step_fft: jax.Array | None = None
    step_window: int = struct.field(pytree_node=False, default=0)
    # [max_instances] instance id -> mpcat40 id (SemanticObjectSensor)
    instance_to_mpcat: jax.Array | None = None
    grid_size: float = struct.field(pytree_node=False, default=0.5)
    sampling_rate: int = struct.field(pytree_node=False, default=16000)
    rir_max_len: int = struct.field(pytree_node=False, default=8000)
    conv_block: int = struct.field(pytree_node=False, default=8192)
    egomap_resolution: float = struct.field(pytree_node=False, default=0.1)

    @classmethod
    def from_assets(
        cls, assets: SceneAssets, rir_dtype=None, precompute_rir_fft=False,
        rir_fft_dtype=None,
    ) -> "DeviceScene":
        """rir_dtype=jnp.bfloat16 halves the RIR bank's HBM footprint and
        host->device transfer; the convolution upcasts per-gather.
        precompute_rir_fft stores partition spectra (2x memory, no per-step
        forward FFTs). rir_fft_dtype=jnp.bfloat16 stores those spectra as
        (re, im) bfloat16 pairs — half the gather bytes of complex64, ~1e-2
        relative waveform error (spectra_to_bf16_pair)."""
        from soundspaces_tpu.ops.partitioned import (
            extend_source_for_slicing,
            precompute_rir_partition_ffts,
            spectra_to_bf16_pair_np,
        )

        g, ac = assets.graph, assets.acoustics
        rir = ac.rir if rir_dtype is None else ac.rir.astype(rir_dtype)
        occupancy, node_xz = _occupancy_grid(g, resolution=0.1)
        part_fft = None
        if precompute_rir_fft:
            host_fft = precompute_rir_partition_ffts(ac.rir, ac.conv_block)
            if rir_fft_dtype is not None:
                assert rir_fft_dtype == jnp.bfloat16, rir_fft_dtype
                # cast to the bf16 (re, im)-pair layout host-side: halves
                # the host->device transfer and avoids both banks briefly
                # coexisting on device (ADVICE r2)
                part_fft = jnp.asarray(spectra_to_bf16_pair_np(host_fft))
            else:
                part_fft = _put_complex(host_fft)
        return cls(
            rir_part_fft=part_fft,
            instance_to_mpcat=(
                None
                if assets.instance_to_mpcat is None
                else jnp.asarray(assets.instance_to_mpcat)
            ),
            points=jnp.asarray(g.points),
            forward_neighbor=jnp.asarray(g.forward_neighbor),
            geodesic_hops=jnp.asarray(g.geodesic_hops),
            oracle_next=jnp.asarray(g.oracle_action),
            rir=jnp.asarray(rir),
            goal_slot_of_node=jnp.asarray(ac.goal_slot_of_node),
            seg_fft=_put_complex(ac.seg_fft),
            seg_block_fft=_put_complex(ac.seg_block_fft),
            sounds=jnp.asarray(ac.sounds),
            sounds_ext=jnp.asarray(
                extend_source_for_slicing(
                    ac.sounds, ac.sound_lengths_sec, ac.sampling_rate,
                    ac.rir_max_len, ac.conv_block,
                )
            ),
            sound_lengths_sec=jnp.asarray(ac.sound_lengths_sec),
            frames={k: jnp.asarray(v) for k, v in assets.frames.modalities.items()},
            occupancy=jnp.asarray(occupancy),
            node_grid_xz=jnp.asarray(node_xz),
            proximity=jnp.asarray(
                _node_proximity(occupancy, node_xz, resolution=0.1)
            ),
            grid_size=float(g.grid_size),
            sampling_rate=int(ac.sampling_rate),
            rir_max_len=int(ac.rir_max_len),
            conv_block=int(ac.conv_block),
        )

    def geodesic(self, a: jax.Array, b: jax.Array) -> jax.Array:
        hops = self.geodesic_hops[a, b]
        return jnp.where(
            hops >= UNREACHABLE, jnp.inf, hops.astype(jnp.float32) * self.grid_size
        )


def _node_proximity(
    occ: np.ndarray, node_xz: np.ndarray, resolution: float, cap: float = 2.0
) -> np.ndarray:
    """Per-node distance to the nearest non-walkable cell, capped (the
    ProximitySensor, soundspaces/tasks/nav.py:777-820)."""
    r = int(round(cap / resolution))
    dz, dx = np.mgrid[-r : r + 1, -r : r + 1]
    dist = np.hypot(dz, dx) * resolution
    out = np.full(node_xz.shape[0], cap, np.float32)
    h, w = occ.shape
    for i, (gx, gz) in enumerate(node_xz):
        z0, z1 = max(gz - r, 0), min(gz + r + 1, h)
        x0, x1 = max(gx - r, 0), min(gx + r + 1, w)
        window = occ[z0:z1, x0:x1]
        d = dist[z0 - gz + r : z1 - gz + r, x0 - gx + r : x1 - gx + r]
        blocked = window < 0.5
        if blocked.any():
            out[i] = min(float(d[blocked].min()), cap)
    return out


@jax.jit
def _combine_complex(ri: jax.Array) -> jax.Array:
    return jax.lax.complex(ri[..., 0], ri[..., 1])


def _put_complex(arr: np.ndarray) -> jax.Array:
    """Upload complex host data as stacked f32 and recombine on device —
    the axon tunnel's transfer path rejects complex dtypes outright."""
    ri = np.stack([arr.real, arr.imag], axis=-1).astype(np.float32)
    return _combine_complex(jnp.asarray(ri))


def _occupancy_grid(graph, resolution: float = 0.1):
    """Walkable occupancy at egomap resolution + per-node cell coords
    (source of the EgoMap sensor; the reference projects depth instead,
    soundspaces/tasks/nav.py:235-405 — on the graph sim the true walkable
    footprint is known)."""
    pts = graph.points
    x0, z0 = pts[:, 0].min(), pts[:, 2].min()
    scale = int(round(graph.grid_size / resolution))
    half = scale // 2
    gx = np.round((pts[:, 0] - x0) / resolution).astype(np.int64) + half
    gz = np.round((pts[:, 2] - z0) / resolution).astype(np.int64) + half
    # margin of blocked cells so any egomap crop fits inside the grid
    margin = 16
    occ = np.zeros(
        (gz.max() + half + 1 + 2 * margin, gx.max() + half + 1 + 2 * margin),
        np.float32,
    )
    for dz in range(-half, half + 1):
        for dx in range(-half, half + 1):
            occ[gz + dz + margin, gx + dx + margin] = 1.0
    node_xz = np.stack([gx + margin, gz + margin], axis=-1).astype(np.int32)
    return occ, node_xz


@struct.dataclass
class EpisodeBank:
    """Episode definitions as parallel arrays (the device form of the
    reference's gzip-JSON AudioNavDataset episodes,
    soundspaces/datasets/audionav_dataset.py:28-165)."""

    start_node: jax.Array  # [E] i32
    start_rot_idx: jax.Array  # [E] i32 (rotation_angle / 90)
    goal_node: jax.Array  # [E] i32
    goal_slot: jax.Array  # [E] i32 index into the RIR bank goal axis
    sound_id: jax.Array  # [E] i32
    geodesic: jax.Array  # [E] f32 start geodesic distance (episode.info)
    oracle_num_action: jax.Array  # [E] i32 (episode.info["num_action"])
    duration_sec: jax.Array  # [E] i32 sound duration for non-everlasting audio
    offset_sec: jax.Array  # [E] i32 sound onset offset (semantic task)
    category: jax.Array  # [E] i32 goal object category
    distractor_sound_id: jax.Array  # [E] i32, -1 = no distractor
    distractor_slot: jax.Array  # [E] i32 RIR goal-slot of the distractor
    # [E, V] i32 nodes from which the goal object is visible, -1 padded
    # (SemanticAudioGoal.view_points, semantic_audionav_task.py:28-46);
    # success = STOP at any of them. Defaults to just the goal node.
    viewpoint_nodes: jax.Array
    # [E] bool, False for slots that are padding duplicates (multi-scene
    # stacking cycles smaller scenes' episodes up to the max count,
    # train/multiscene.py::stack_episode_banks). Sequential eval plays but
    # does NOT score invalid slots, so a smaller scene's episodes are never
    # double-counted. None (single-scene banks) means all-valid.
    valid: jax.Array | None = None

    @property
    def num_episodes(self) -> int:
        return self.start_node.shape[0]


@struct.dataclass
class EnvState:
    """Full per-env simulation state; batched with a leading axis."""

    node: jax.Array  # i32
    rot_idx: jax.Array  # i32 in [0, 4)
    goal_node: jax.Array
    goal_slot: jax.Array
    sound_id: jax.Array
    category: jax.Array
    distractor_sound_id: jax.Array
    distractor_slot: jax.Array
    audio_index: jax.Array  # i32 second-index into the source sound
    step_count: jax.Array  # i32 steps taken this episode
    duration_sec: jax.Array  # i32
    # episode bookkeeping
    start_node: jax.Array
    start_rot_idx: jax.Array
    start_geodesic: jax.Array  # f32
    oracle_num_action: jax.Array  # i32
    prev_geodesic: jax.Array  # f32 (for the distance-delta reward)
    path_length: jax.Array  # f32 cumulative euclidean path
    num_actions: jax.Array  # i32
    collided: jax.Array  # bool
    # per-episode collision count (habitat's Collisions measure, referenced
    # by the eval configs — configs/audionav/av_nav/replica/audiogoal.yaml)
    collision_count: jax.Array  # i32
    viewpoint_nodes: jax.Array  # [V] i32 success nodes, -1 padded
    ep_ptr: jax.Array  # i32 sequential episode cursor
    rng: jax.Array  # PRNG key


def make_episode_bank(
    assets: SceneAssets,
    num_episodes: int,
    seed: int = 0,
    min_geodesic_hops: int = 1,
    duration_sec: int | None = None,
    with_distractors: bool = False,
) -> EpisodeBank:
    """Sample a synthetic episode set over a scene's graph/goal slots.
    Real datasets load through soundspaces_tpu.datasets instead."""
    g, ac = assets.graph, assets.acoustics
    rng = np.random.default_rng(seed)
    starts = np.zeros(num_episodes, np.int32)
    rots = rng.integers(0, 4, num_episodes).astype(np.int32)
    slots = rng.integers(0, len(ac.goal_nodes), num_episodes).astype(np.int32)
    goals = ac.goal_nodes[slots]
    n_sounds = int(ac.seg_fft.shape[0])
    if assets.node_category is not None:
        # category belongs to the goal OBJECT (the node's category), and the
        # sound is one of the clips voicing that category (clip s voices
        # category s % n_cat) — category != f(sound), so the belief task is
        # a real inference problem (semantic_audionav_task.py's object
        # categories vs per-category sound clips)
        categories = assets.node_category[goals].astype(np.int32)
        n_cat = int(assets.node_category.max()) + 1
        n_cat = min(n_cat, n_sounds)
        categories = categories % n_cat
        clips_per = [
            len(range(c, n_sounds, n_cat)) for c in range(n_cat)
        ]
        k = rng.integers(0, 1 << 30, num_episodes)
        sounds = np.array(
            [
                c + n_cat * (kk % clips_per[c])
                for c, kk in zip(categories, k)
            ],
            np.int32,
        )
    else:
        sounds = rng.integers(0, n_sounds, num_episodes).astype(np.int32)
        categories = (sounds % 21).astype(np.int32)
    geo = np.zeros(num_episodes, np.float32)
    na = np.zeros(num_episodes, np.int32)
    for i in range(num_episodes):
        while True:
            s = int(rng.integers(0, g.num_nodes))
            hops = int(g.geodesic_hops[s, goals[i]])
            if hops >= min_geodesic_hops and hops < UNREACHABLE:
                break
        starts[i] = s
        geo[i] = hops * g.grid_size
        na[i] = _oracle_num_actions(g, s, int(rots[i]), int(goals[i]))
    dur = np.full(
        num_episodes,
        duration_sec if duration_sec is not None else 500,
        np.int32,
    )
    if with_distractors:
        # distractor at a different goal slot with a different sound
        d_slot = (slots + 1 + rng.integers(0, max(len(ac.goal_nodes) - 1, 1),
                                           num_episodes)) % len(ac.goal_nodes)
        d_sound = (sounds + 1) % max(ac.seg_fft.shape[0], 1)
    else:
        d_slot = np.full(num_episodes, -1, np.int32)
        d_sound = np.full(num_episodes, -1, np.int32)
    return EpisodeBank(
        viewpoint_nodes=jnp.asarray(goals.astype(np.int32))[:, None],
        start_node=jnp.asarray(starts),
        start_rot_idx=jnp.asarray(rots),
        goal_node=jnp.asarray(goals.astype(np.int32)),
        goal_slot=jnp.asarray(slots),
        sound_id=jnp.asarray(sounds),
        geodesic=jnp.asarray(geo),
        oracle_num_action=jnp.asarray(na),
        duration_sec=jnp.asarray(dur),
        offset_sec=jnp.zeros(num_episodes, jnp.int32),
        category=jnp.asarray(categories),
        distractor_sound_id=jnp.asarray(d_sound.astype(np.int32)),
        distractor_slot=jnp.asarray(d_slot.astype(np.int32)),
    )


def _oracle_num_actions(g, node: int, rot_idx: int, goal: int) -> int:
    """Count of oracle actions (turns + forwards + stop) along the shortest
    path, mirroring the reference's compute_oracle_actions
    (soundspaces/simulator.py:725-751)."""
    count = 0
    guard = 0
    while node != goal and guard < 10_000:
        nxt = int(g.oracle_action[node, goal])
        if nxt < 0:
            break
        # which rotation faces nxt?
        target_rot = -1
        for r in range(4):
            if g.forward_neighbor[node, r] == nxt:
                target_rot = r
                break
        if target_rot < 0:
            break
        delta = (target_rot - rot_idx) % 4
        count += min(delta, 4 - delta)  # turns
        rot_idx = target_rot
        node = nxt
        count += 1  # forward
        guard += 1
    return count + 1  # STOP
