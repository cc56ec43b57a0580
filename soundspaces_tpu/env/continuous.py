"""SS2.0-style continuous-motion AudioGoal environment.

The reference's ContinuousSoundSpacesSim (soundspaces/continuous_simulator.py:
56-527) moves the agent freely on the navmesh and renders a fresh RIR every
step with the RLRAudioPropagation ray tracer; audio is a STEP_TIME-long
window of the source convolved with that RIR, crossfaded 50 ms against the
previous step's RIR (428-456, 47-53).

TPU-native: continuous pose (x, z, heading) with occupancy-grid collision;
the per-pose RIR comes from the HBM bank at the nearest graph node and
nearest 90-degree azimuth ("bank"), a fresh native C++ ray trace at the
exact pose via host callback ("tracer"; "tracer3d" for the full 3-D
engine with floor/ceiling reflections and source heights —
tools/rir_synth.py), fully
on-device parametric synthesis at the exact pose ("parametric",
ops/parametric_rir.py), or a tracer-distilled neural field ("neural",
ops/neural_rir.py). Audio windowing and crossfade follow the
reference's sample-cursor semantics exactly, via the partitioned
convolution with on-the-fly delay-line spectra (computed once per step,
shared by the crossfade pair; bank mode convolves against the
precomputed RIR partition spectra when present).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from soundspaces_tpu.env.structs import DeviceScene, EpisodeBank
from soundspaces_tpu.ops.crossfade import crossfade
from soundspaces_tpu.ops.partitioned import (
    partitioned_windowed_convolve,
    partitioned_windowed_convolve_fft,
    segment_block_ffts_from_ext,
    segment_block_ffts_from_source,
)
from soundspaces_tpu.ops.stft import spectrogram
from soundspaces_tpu.scene.graph import MOVE_FORWARD, STOP, TURN_LEFT, TURN_RIGHT

# rir_source values that render a FRESH pose-exact RIR each step (carried in
# state.rir/prev_rir) rather than gathering the precomputed bank
FRESH_RIR_SOURCES = (
    "tracer", "tracer3d", "tracer3d_coherent", "parametric", "neural"
)


def add_step_window_table(scene: DeviceScene, step_time: float) -> DeviceScene:
    """Precompute the delay-line spectra at every step-window-aligned cursor
    (computed ON DEVICE from the wrap-extended sources — nothing uploads).

    The continuous cursor advances by exactly step_time*sr each step
    (continuous_simulator.py:422), so once the RANDOM INITIAL cursor
    (continuous_simulator.py:344) is quantized to window boundaries, every
    cursor the episode can visit lies on the W = max_samples/window grid —
    and the per-step forward FFTs (the continuous mode's dominant cost)
    become one gather from this [S, W, K, B] table, exactly like the
    discrete path's per-second spectra bank. Returns the scene unchanged if
    the sound lengths don't divide into whole windows."""
    num_sample = int(round(step_time * scene.sampling_rate))
    if scene.sounds_ext is None or num_sample <= 0:
        return scene
    lengths = np.asarray(scene.sound_lengths_sec) * scene.sampling_rate
    if (lengths % num_sample).any():
        return scene  # cursor grid would drift off the table
    max_w = int(scene.sounds.shape[1]) // num_sample
    if max_w <= 0:
        return scene
    starts = jnp.arange(max_w, dtype=jnp.int32) * num_sample

    @jax.jit
    def build(ext_rows):
        f = jax.vmap(
            jax.vmap(
                lambda ext, s: segment_block_ffts_from_ext(
                    ext, s, num_sample, scene.rir_max_len, scene.conv_block
                ),
                in_axes=(None, 0),
            ),
            in_axes=(0, None),
        )
        return f(ext_rows, starts)

    table = build(scene.sounds_ext)  # [S, W, K, B] packed c64
    return scene.replace(seg_step_fft=table, step_window=num_sample)


@dataclasses.dataclass(frozen=True)
class ContinuousConfig:
    """Continuous-mode knobs (reference av_nav/config/default.py:216-227:
    CONTINUOUS=True sets step 0.25 m and enables crossfade)."""

    step_size: float = 0.25
    turn_angle_deg: float = 10.0
    step_time: float = 0.25  # seconds of audio per step
    use_crossfade: bool = True
    success_distance: float = 0.36
    max_episode_steps: int = 500
    slack_reward: float = -0.01
    success_reward: float = 10.0
    distance_reward_scale: float = 1.0
    sensors: tuple[str, ...] = ("spectrogram",)
    # walkability model: "occupancy" marches the step segment through the
    # walkable occupancy grid (the navmesh-collision role of habitat's
    # pathfinder.try_step, continuous_simulator.py:464-480) so corners
    # cannot be cut through walls; "radius" is the round-1 node-distance
    # check kept as a fallback/oracle
    walkability: str = "occupancy"
    # semantic-task knobs (semantic_audionav_task.py; same task layer drives
    # the continuous sim in the reference)
    everlasting: bool = True  # False: source silent past episode duration
    has_distractor_sound: bool = False  # mix a distractor source (bank mode)
    num_categories: int = 21
    # where the per-step RIR comes from: "bank" gathers the precomputed HBM
    # bank at the nearest (node, azimuth); "tracer" renders a FRESH RIR at
    # the exact continuous pose each step with the native C++ ray tracer via
    # host callback — the reference's AudioSensor behavior
    # (continuous_simulator.py:115-126). Tracer mode is host-bound by
    # design (so is the reference's CPU ray tracer). "parametric" synthesizes
    # the RIR at the exact pose ON DEVICE (ops/parametric_rir.py: image-source
    # reflections + Sabine 4-band tails) — pose-exact like the tracer but
    # jit/vmap-native, so it runs at full TPU batch rates. "neural" serves a
    # tracer-distilled MLP field (ops/neural_rir.py) — pose-exact, learned,
    # and fully on device (pass neural_field=(net, params) to the env)
    rir_source: str = "bank"
    # parametric-mode acoustics (4 bands, the ray tracer's band count):
    # per-band mean surface absorption (tools/materials.py spectra), room
    # height for the shoebox model, broadband wall reflection absorption
    parametric_absorption: tuple[float, ...] = (0.10, 0.20, 0.35, 0.50)
    room_height: float = 3.0
    wall_absorption: float = 0.3
    parametric_noise_seed: int = 0
    # live on-device depth rasterization at the exact pose (ops/raycast.py)
    # instead of nearest-node frame-cache gathers
    live_depth: bool = False
    depth_size: int = 128
    # process the env batch in this many sequential chunks inside the jitted
    # step (lax.map) — large audio batches lose HBM locality (see
    # EnvConfig.step_chunks)
    step_chunks: int = 1
    # quantize the random initial sample cursor to step-window boundaries so
    # per-step delay-line spectra come from the precomputed seg_step_fft
    # table (add_step_window_table) — no forward FFTs on the hot path; the
    # only semantic change vs the reference is that the random initial
    # cursor (continuous_simulator.py:344) lands on a window boundary
    quantized_cursor: bool = True
    # "random" (training) or "sequential" (eval sweeps over a fixed episode
    # list — EnvConfig.episode_sampling)
    episode_sampling: str = "random"

    @property
    def num_actions(self) -> int:
        # STOP, MOVE_FORWARD, TURN_LEFT, TURN_RIGHT (the reference's
        # continuous action set, av_nav/config/default.py:216-227)
        return 4


@struct.dataclass
class ContinuousEnvState:
    x: jax.Array  # f32 world coords
    z: jax.Array
    heading: jax.Array  # f32 radians, mesh-frame compass angle
    goal_node: jax.Array
    goal_slot: jax.Array
    sound_id: jax.Array
    sample_index: jax.Array  # i32 cursor into the source sound
    prev_node: jax.Array  # last step's RIR indices (for crossfade)
    prev_az: jax.Array
    step_count: jax.Array
    start_geodesic: jax.Array
    prev_geodesic: jax.Array
    path_length: jax.Array
    collided: jax.Array
    collision_count: jax.Array  # per-episode (habitat Collisions measure)
    ep_ptr: jax.Array
    rng: jax.Array
    # semantic-task episode fields (semantic_audionav_task.py:28-46)
    duration_sec: jax.Array  # i32 sound duration (SWS / silencing)
    category: jax.Array  # i32 goal object category
    oracle_num_action: jax.Array  # i32 (SNA normalizer, episode info)
    distractor_sound_id: jax.Array  # i32, -1 = none
    distractor_slot: jax.Array  # i32 RIR slot of the distractor
    viewpoint_nodes: jax.Array  # [V] i32 success nodes, -1 padded
    # tracer/parametric modes only (None in bank mode): the current pose's
    # fresh RIR and the previous step's, so crossfade never re-renders
    rir: jax.Array | None = None
    prev_rir: jax.Array | None = None
    # fresh-mode distractor: its own pose-exact RIR pair (each fresh source
    # synthesizes per-(pose, source), so the distractor gets a second render
    # — the task layer drives either simulator uniformly,
    # semantic_audionav_task.py:174-210)
    d_rir: jax.Array | None = None
    prev_d_rir: jax.Array | None = None
    # parametric mode: per-episode circular shift decorrelating the static
    # band-noise tables across episodes (fixed within an episode so
    # consecutive steps stay temporally coherent)
    tail_shift: jax.Array | None = None


class ContinuousAudioNavEnv:
    """Batched continuous env over the same DeviceScene banks."""

    def __init__(
        self,
        config: ContinuousConfig,
        scene: DeviceScene,
        episodes: EpisodeBank,
        num_envs: int,
        tracer=None,  # tools.rir_synth.PoseTracer for rir_source="tracer"
        neural_field=None,  # (NeuralRIRField, params) for rir_source="neural"
    ):
        self.config = config
        self.scene = scene
        self.episodes = episodes
        self.num_envs = num_envs
        assert num_envs % config.step_chunks == 0, (
            f"num_envs={num_envs} must be divisible by "
            f"step_chunks={config.step_chunks} (the chunked HBM-locality "
            "path would silently be dropped otherwise)"
        )
        self._tracer = tracer
        if config.rir_source in ("tracer", "tracer3d", "tracer3d_coherent"):
            assert tracer is not None, (
                "rir_source='tracer' needs a PoseTracer (tools.rir_synth); "
                "'tracer3d' a HorizontalPoseAdapter over PoseTracer3D "
                "('tracer3d_coherent': over CoherentPoseTracer3D)"
            )
            assert tracer.rir_max_len == scene.rir_max_len
        self._neural_net, self._neural_params = (None, None)
        if config.rir_source == "neural":
            assert neural_field is not None, (
                "rir_source='neural' needs (NeuralRIRField, params) — train "
                "one with ops.neural_rir.train_neural_rir_field"
            )
            self._neural_net, self._neural_params = neural_field
        # distractor mixing works under every rir_source: bank mode gathers
        # the distractor slot's RIR; fresh modes render a second pose-exact
        # RIR at the distractor's position (d_rir in the state)
        self._band_noise = None
        if config.rir_source in ("parametric", "neural"):
            from soundspaces_tpu.ops.parametric_rir import band_noise_tables

            self._band_noise = jnp.asarray(
                band_noise_tables(
                    int(scene.rir_max_len), int(scene.sampling_rate),
                    config.parametric_noise_seed,
                )
            )
        if (
            config.quantized_cursor
            and scene.seg_step_fft is None
            and scene.sounds_ext is not None
        ):
            self.scene = scene = add_step_window_table(
                scene, config.step_time
            )
        self._reset_jit = jax.jit(self.reset_pure)
        self._step_jit = jax.jit(self.step_pure)

    # ------------------------------------------------------------- public API
    def reset(self, rng):
        keys = jax.random.split(rng, self.num_envs)
        ids = jnp.arange(self.num_envs, dtype=jnp.int32)
        return self._reset_jit(self.scene, self.episodes, keys, ids)

    def step(self, state, actions):
        return self._step_jit(self.scene, self.episodes, state, actions)

    def reset_pure(self, scene, episodes, keys, env_ids):
        return jax.vmap(self._reset_one, in_axes=(None, None, 0, 0))(
            scene, episodes, keys, env_ids
        )

    def step_pure(self, scene, episodes, state, actions):
        # same HBM-locality fix as the discrete env (audionav.py): past ~128
        # envs the audio batch loses locality — process in sequential chunks
        c = self.config.step_chunks
        if c > 1 and actions.shape[0] % c == 0:
            def one_chunk(args):
                st, ac = args
                return jax.vmap(self._step_one, in_axes=(None, None, 0, 0))(
                    scene, episodes, st, ac
                )

            stc = jax.tree.map(
                lambda x: x.reshape((c, -1) + x.shape[1:]), state
            )
            out = jax.lax.map(one_chunk, (stc, actions.reshape(c, -1)))
            return jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), out
            )
        return jax.vmap(self._step_one, in_axes=(None, None, 0, 0))(
            scene, episodes, state, actions
        )

    # ------------------------------------------------------------ single env
    def _nearest_node(self, scene, x, z):
        d2 = (scene.points[:, 0] - x) ** 2 + (scene.points[:, 2] - z) ** 2
        return jnp.argmin(d2).astype(jnp.int32)

    def _az_idx(self, heading):
        """Quantize the compass heading to the bank's four azimuths: the
        rotation angle is (270 - deg(heading)) and azimuth = -rotation
        (simulator.py:564-573)."""
        deg = jnp.rad2deg(heading)
        rot = jnp.round((270.0 - deg) / 90.0).astype(jnp.int32) % 4
        return (4 - rot) % 4

    def _episode_index(self, episodes, rng, ep_ptr):
        if self.config.episode_sampling == "sequential":
            return ep_ptr % episodes.num_episodes
        return jax.random.randint(rng, (), 0, episodes.num_episodes)

    def _load_episode(self, scene, episodes, state_rng, ep_ptr):
        ep = episodes
        rng, sub, sub2, sub3 = jax.random.split(state_rng, 4)
        i = self._episode_index(ep, sub, ep_ptr)
        node = ep.start_node[i]
        geo = ep.geodesic[i]
        heading = jnp.deg2rad(
            270.0 - 90.0 * ep.start_rot_idx[i].astype(jnp.float32)
        )
        sound_len = jnp.maximum(scene.sound_lengths_sec[ep.sound_id[i]], 1)
        # random initial sample cursor (continuous_simulator.py:344),
        # quantized to step-window boundaries when the spectra table is on
        if self.config.quantized_cursor and scene.seg_step_fft is not None:
            w = scene.step_window
            n_windows = jnp.maximum(sound_len * scene.sampling_rate // w, 1)
            sample0 = jax.random.randint(sub2, (), 0, n_windows) * w
        else:
            sample0 = jax.random.randint(
                sub2, (), 0, sound_len * scene.sampling_rate
            )
        fresh_mode = self.config.rir_source in FRESH_RIR_SOURCES
        zero_rir = (
            jnp.zeros((2, scene.rir_max_len), jnp.float32)
            if fresh_mode
            else None
        )
        tail_shift = (
            jax.random.randint(sub3, (), 0, scene.rir_max_len)
            if self.config.rir_source in ("parametric", "neural")
            else None
        )
        zero_d_rir = (
            zero_rir if self.config.has_distractor_sound else None
        )
        return ContinuousEnvState(
            rir=zero_rir,
            prev_rir=zero_rir,
            d_rir=zero_d_rir,
            prev_d_rir=zero_d_rir,
            tail_shift=tail_shift,
            x=scene.points[node, 0],
            z=scene.points[node, 2],
            heading=heading,
            goal_node=ep.goal_node[i],
            goal_slot=ep.goal_slot[i],
            sound_id=ep.sound_id[i],
            sample_index=sample0,
            prev_node=node,
            prev_az=self._az_idx(heading),
            step_count=jnp.int32(0),
            start_geodesic=geo,
            prev_geodesic=geo,
            path_length=jnp.float32(0.0),
            collided=jnp.bool_(False),
            collision_count=jnp.int32(0),
            ep_ptr=ep_ptr + jnp.int32(self.num_envs),
            rng=rng,
            duration_sec=ep.duration_sec[i],
            category=ep.category[i],
            oracle_num_action=ep.oracle_num_action[i],
            distractor_sound_id=ep.distractor_sound_id[i],
            distractor_slot=ep.distractor_slot[i],
            viewpoint_nodes=ep.viewpoint_nodes[i],
        )

    def _world_to_cell(self, scene, px, pz):
        """World -> occupancy-grid cell via the node-0 anchor (the grid is
        affine; node_grid_xz carries each node's cell so the origin is
        recoverable exactly)."""
        res = scene.egomap_resolution
        ox = scene.points[0, 0] - scene.node_grid_xz[0, 0].astype(jnp.float32) * res
        oz = scene.points[0, 2] - scene.node_grid_xz[0, 1].astype(jnp.float32) * res
        cx = jnp.round((px - ox) / res).astype(jnp.int32)
        cz = jnp.round((pz - oz) / res).astype(jnp.int32)
        h, w = scene.occupancy.shape
        return jnp.clip(cz, 0, h - 1), jnp.clip(cx, 0, w - 1)

    def _walkable(self, scene, x, z, nx, nz):
        """Is the step (x,z)->(nx,nz) free? "occupancy" (default) marches
        the segment through the walkable occupancy grid — the
        pathfinder.try_step role (continuous_simulator.py:464-480); a wall
        cell anywhere on the segment blocks the move, so corners cannot be
        cut through walls. "radius": round-1 nearest-node distance check."""
        if self.config.walkability == "radius":
            d2 = (scene.points[:, 0] - nx) ** 2 + (scene.points[:, 2] - nz) ** 2
            return jnp.min(d2) < (scene.grid_size * 0.75) ** 2
        ts = jnp.linspace(0.25, 1.0, 4)
        px = x + ts * (nx - x)
        pz = z + ts * (nz - z)
        cz, cx = self._world_to_cell(scene, px, pz)
        return jnp.all(scene.occupancy[cz, cx] > 0.5)

    def _geodesic(self, scene, x, z, goal_node):
        """Continuous geodesic: min over LOCALLY REACHABLE graph nodes of
        (euclidean to the node + node->goal graph distance) — the
        graph-augmented metric that stands in for habitat's navmesh geodesic
        (continuous_simulator.py:464-480). Unlike nearest-node hop counts it
        changes with every sub-node motion, so the distance-delta reward
        (environments.py:74-91) gives dense shaping in continuous mode.

        The min MUST be restricted to nodes within one grid cell of the
        agent (plus the nearest node as a fallback): an unrestricted min
        would pick the goal node itself and collapse the metric to
        straight-line-through-walls distance, which (a) halves the reported
        distance on multi-room worlds, and (b) hands every episode's FIRST
        step a spurious (graph_geodesic - euclid) reward spike at the
        auto-reset boundary, because prev_geodesic is initialized from the
        episode's stored graph geodesic. A random quick-STOP policy farms
        that reset spike — the round-3 realistic continuous run's
        reward-60-per-32-step-window, success-0.002 signature. At a node
        position the restricted metric equals hops*grid_size exactly, so it
        is consistent with the dataset's episode geodesics. Walls occupy
        whole grid cells in cell-based worlds, so no node across a wall is
        ever within grid_size of a walkable pose."""
        d = jnp.sqrt(
            (scene.points[:, 0] - x) ** 2 + (scene.points[:, 2] - z) ** 2
        )
        hops = scene.geodesic_hops[:, goal_node].astype(jnp.float32)
        local = (d <= scene.grid_size) | (d <= jnp.min(d))
        return jnp.min(
            jnp.where(local, d + hops * scene.grid_size, jnp.inf)
        )

    def _reset_one(self, scene, episodes, rng, env_id):
        state = self._load_episode(scene, episodes, rng, env_id)
        if self.config.rir_source in FRESH_RIR_SOURCES:
            all_fresh = jnp.ones(jnp.shape(state.x), bool)
            rir = self._fresh_rir(scene, state, fresh=all_fresh)
            updates = dict(rir=rir, prev_rir=rir)
            if self.config.has_distractor_sound:
                d_rir = self._fresh_rir(
                    scene, state, self._distractor_node(scene, state),
                    slot=1, fresh=all_fresh,
                )
                updates.update(d_rir=d_rir, prev_d_rir=d_rir)
            state = state.replace(**updates)
        return state, self._observe(scene, state)

    def _distractor_node(self, scene, state):
        """Graph node of the distractor's RIR slot (slot -> node inversion
        of goal_slot_of_node); garbage when no distractor — callers mask
        on distractor_sound_id >= 0."""
        d_slot = jnp.maximum(state.distractor_slot, 0)
        return jnp.argmax(
            scene.goal_slot_of_node == d_slot
        ).astype(jnp.int32)

    def _fresh_rir(self, scene, state, src_node=None, slot=0, fresh=None):
        """Pose-exact RIR at the state's continuous pose: native ray trace
        (host callback), on-device parametric synthesis, or the distilled
        neural RIR field (ops/neural_rir.py). `src_node` overrides the
        source position (distractor rendering); `slot`/`fresh` drive the
        coherent tracer's per-source cache and episode-boundary
        invalidation (tools/rir_synth.py CoherentPoseTracer3D)."""
        src = state.goal_node if src_node is None else src_node
        if self.config.rir_source in (
            "tracer", "tracer3d", "tracer3d_coherent"
        ):
            return self._traced_rir(
                scene, state.x, state.z, state.heading, src,
                slot=slot, fresh=fresh,
            )
        if self.config.rir_source == "neural":
            return self._neural_rir(scene, state, src)
        return self._parametric_rir(scene, state, src)

    def _neural_rir(self, scene, state, src_node=None):
        """Distilled tracer: MLP-predicted diffuse envelopes + analytic
        direct path, entirely on device (ops/neural_rir.py)."""
        from soundspaces_tpu.ops.neural_rir import neural_binaural_rir

        src = state.goal_node if src_node is None else src_node
        pts = scene.points
        bbox_min = jnp.stack([pts[:, 0].min(), pts[:, 2].min()])
        bbox_max = jnp.stack([pts[:, 0].max(), pts[:, 2].max()])
        return neural_binaural_rir(
            self._neural_params, self._neural_net,
            state.x, state.z, state.heading,
            scene.points[src, 0],
            scene.points[src, 2],
            self._band_noise, bbox_min, bbox_max, state.tail_shift,
            int(scene.sampling_rate), int(scene.rir_max_len),
        )

    def _step_one(self, scene, episodes, state, action):
        cfg = self.config
        is_stop = action == STOP
        is_fwd = action == MOVE_FORWARD
        # heading convention: forward = (cos h, sin h) in (x, z)
        nx = state.x + cfg.step_size * jnp.cos(state.heading) * is_fwd
        nz = state.z + cfg.step_size * jnp.sin(state.heading) * is_fwd
        ok = self._walkable(scene, state.x, state.z, nx, nz)
        new_x = jnp.where(ok, nx, state.x)
        new_z = jnp.where(ok, nz, state.z)
        collided = is_fwd & ~ok
        collision_count = state.collision_count + collided.astype(jnp.int32)
        turn = jnp.deg2rad(cfg.turn_angle_deg)
        new_heading = state.heading + jnp.where(
            action == TURN_LEFT, -turn, jnp.where(action == TURN_RIGHT, turn, 0.0)
        )

        step_count = state.step_count + 1
        moved = jnp.sqrt((new_x - state.x) ** 2 + (new_z - state.z) ** 2)
        geo = self._geodesic(scene, new_x, new_z, state.goal_node)
        # success = STOP near the goal or any of its view points (the
        # semantic task's object-visibility success,
        # semantic_audionav_task.py:28-46; plain AudioGoal's view-point set
        # is just the goal node)
        vp = state.viewpoint_nodes
        vp_ok = vp >= 0
        vpd2 = jnp.where(
            vp_ok,
            (scene.points[jnp.maximum(vp, 0), 0] - new_x) ** 2
            + (scene.points[jnp.maximum(vp, 0), 2] - new_z) ** 2,
            jnp.inf,
        )
        euclid2 = jnp.minimum(
            (scene.points[state.goal_node, 0] - new_x) ** 2
            + (scene.points[state.goal_node, 2] - new_z) ** 2,
            jnp.min(vpd2),
        )
        success = is_stop & (euclid2 < cfg.success_distance**2)
        done = is_stop | (step_count >= cfg.max_episode_steps)

        reward = (
            cfg.slack_reward
            + (state.prev_geodesic - geo) * cfg.distance_reward_scale
            + jnp.where(success, cfg.success_reward, 0.0)
        )
        path_length = state.path_length + moved
        # the full measure suite (nav.py:108-232, semantic_audionav_task.py:
        # 213-235), as in the discrete env
        sf = success.astype(jnp.float32)
        start_geo = state.start_geodesic
        spl = sf * start_geo / jnp.maximum(start_geo, path_length)
        softspl = jnp.clip(
            1.0 - geo / jnp.maximum(start_geo, 1e-6), 0.0, 1.0
        ) * (start_geo / jnp.maximum(start_geo, path_length))
        ona = jnp.where(
            state.oracle_num_action > 0,
            state.oracle_num_action.astype(jnp.float32),
            start_geo / cfg.step_size,
        )
        sna = sf * ona / jnp.maximum(ona, step_count.astype(jnp.float32))
        elapsed_sec = step_count.astype(jnp.float32) * cfg.step_time
        silent = (
            elapsed_sec > state.duration_sec.astype(jnp.float32)
        ).astype(jnp.float32)
        info = {
            "success": sf,
            "spl": spl,
            "softspl": softspl,
            "distance_to_goal": geo,
            "normalized_distance_to_goal": geo / jnp.maximum(start_geo, 1e-6),
            "na": step_count.astype(jnp.float32),
            "sna": sna,
            "sws": sf * silent,
            "collisions": collision_count.astype(jnp.float32),
        }
        if cfg.episode_sampling == "sequential":
            # first-pass + padding gate, as in the discrete env: sequential
            # eval scores each bank episode exactly once (audionav.py
            # _step_one ep_valid)
            cur_raw = state.ep_ptr - jnp.int32(self.num_envs)
            first_pass = (cur_raw < episodes.num_episodes).astype(jnp.float32)
            cur = jnp.mod(cur_raw, episodes.num_episodes)
            v = (
                episodes.valid[cur].astype(jnp.float32)
                if episodes.valid is not None
                else jnp.float32(1.0)
            )
            info["ep_valid"] = v * first_pass

        sound_samples = (
            jnp.maximum(scene.sound_lengths_sec[state.sound_id], 1)
            * scene.sampling_rate
        )
        num_sample = jnp.int32(round(cfg.step_time * scene.sampling_rate))
        continued = state.replace(
            x=new_x,
            z=new_z,
            heading=new_heading,
            sample_index=(state.sample_index + num_sample) % sound_samples,
            prev_node=self._nearest_node(scene, state.x, state.z),
            prev_az=self._az_idx(state.heading),
            step_count=step_count,
            prev_geodesic=geo,
            path_length=path_length,
            collided=collided,
            collision_count=collision_count,
        )
        fresh = self._load_episode(scene, episodes, state.rng, state.ep_ptr)
        new_state = jax.tree.map(lambda a, b: jnp.where(done, a, b), fresh, continued)
        if self.config.rir_source in FRESH_RIR_SOURCES:
            # render the merged pose ONCE; the previous pose's RIR is carried
            # (on reset, prev = current so the crossfade is a no-op).
            # `fresh=done` invalidates the coherent tracer's cache for
            # auto-reset envs (a new episode spawning near the old pose
            # must not reuse the dead episode's field)
            rir = self._fresh_rir(scene, new_state, fresh=done)
            updates = dict(rir=rir, prev_rir=jnp.where(done, rir, state.rir))
            if self.config.has_distractor_sound:
                d_rir = self._fresh_rir(
                    scene, new_state,
                    self._distractor_node(scene, new_state),
                    slot=1, fresh=done,
                )
                updates.update(
                    d_rir=d_rir,
                    prev_d_rir=jnp.where(done, d_rir, state.d_rir),
                )
            new_state = new_state.replace(**updates)
        return new_state, self._observe(scene, new_state), reward, done, info

    # -------------------------------------------------------------- sensors
    def _traced_rir(self, scene, x, z, heading, goal_node, slot=0,
                    fresh=None):
        """Fresh RIR at the exact continuous pose via the native ray tracer
        (host callback; the role of sim.get_sensor_observations()['audio_
        sensor'], continuous_simulator.py:408-412)."""
        recv = jnp.stack(
            [x, z, heading.astype(jnp.float32)], axis=-1
        ).astype(jnp.float32)
        src = jnp.stack(
            [scene.points[goal_node, 0], scene.points[goal_node, 2]], axis=-1
        ).astype(jnp.float32)
        rir_len = scene.rir_max_len
        tracer = self._tracer
        coherent = self.config.rir_source == "tracer3d_coherent"
        if fresh is None:
            fresh = jnp.zeros(recv.shape[:-1], bool)

        if coherent:

            def host(recv_np, src_np, fresh_np):
                r = np.asarray(recv_np, np.float32)
                s = np.asarray(src_np, np.float32)
                lead = r.shape[:-1]
                out = tracer(
                    r.reshape(-1, 3), s.reshape(-1, 2), slot=slot,
                    fresh=np.asarray(fresh_np, bool).reshape(-1),
                )
                return out.reshape(lead + (2, rir_len)).astype(np.float32)

            shape = jax.ShapeDtypeStruct((2, rir_len), jnp.float32)
            return jax.pure_callback(
                host, shape, recv, src, fresh, vmap_method="broadcast_all"
            )

        def host(recv_np, src_np):
            r = np.asarray(recv_np, np.float32)
            s = np.asarray(src_np, np.float32)
            lead = r.shape[:-1]
            out = tracer(r.reshape(-1, 3), s.reshape(-1, 2))
            return out.reshape(lead + (2, rir_len)).astype(np.float32)

        shape = jax.ShapeDtypeStruct((2, rir_len), jnp.float32)
        return jax.pure_callback(
            host, shape, recv, src, vmap_method="broadcast_all"
        )

    def _parametric_rir(self, scene, state, src_node=None):
        """On-device pose-exact RIR (ops/parametric_rir.py): image-source
        early reflections over the scene's bounding shoebox + Sabine
        4-band tails from the static noise tables."""
        from soundspaces_tpu.ops.parametric_rir import (
            parametric_binaural_rir,
            sabine_rt60,
        )

        cfg = self.config
        src = state.goal_node if src_node is None else src_node
        pts = scene.points
        bbox_min = jnp.stack([pts[:, 0].min(), pts[:, 2].min()])
        bbox_max = jnp.stack([pts[:, 0].max(), pts[:, 2].max()])
        ext = jnp.concatenate(
            [bbox_max - bbox_min, jnp.array([cfg.room_height])]
        )
        rt60 = sabine_rt60(ext, jnp.asarray(cfg.parametric_absorption))
        return parametric_binaural_rir(
            state.x, state.z, state.heading,
            scene.points[src, 0], scene.points[src, 2],
            self._band_noise, rt60, bbox_min, bbox_max, state.tail_shift,
            int(scene.sampling_rate), int(scene.rir_max_len),
            room_height=cfg.room_height,
            wall_absorption=cfg.wall_absorption,
        )

    def _distractor_audio(self, scene, state):
        """Crossfaded audio of the distractor source (the reference mixes a
        second fftconvolve the same way, simulator.py:649-664). Bank mode
        gathers the distractor slot's RIR; fresh modes use the pose-exact
        d_rir pair rendered alongside the goal RIR."""
        cfg = self.config
        d_sound = jnp.maximum(state.distractor_sound_id, 0)
        d_slot = jnp.maximum(state.distractor_slot, 0)
        d_samples = (
            jnp.maximum(scene.sound_lengths_sec[d_sound], 1)
            * scene.sampling_rate
        )
        d_state = state.replace(
            sound_id=d_sound, goal_slot=d_slot,
            sample_index=state.sample_index % d_samples,
        )
        seg = self._seg_spectra(scene, d_state)
        if cfg.rir_source in FRESH_RIR_SOURCES:
            audio = self._render_audio(scene, d_state, state.d_rir, seg)
            if cfg.use_crossfade:
                prev_head = self._render_audio_head(
                    scene, state.prev_d_rir, seg
                )
                audio = crossfade(prev_head, audio, scene.sampling_rate)
        else:
            node = self._nearest_node(scene, state.x, state.z)
            az = self._az_idx(state.heading)
            rir = self._bank_rir(scene, d_state, node, az)
            audio = self._render_audio(scene, d_state, rir, seg)
            if cfg.use_crossfade:
                prev_head = self._render_audio_head(
                    scene,
                    self._bank_rir(scene, d_state, state.prev_node,
                                   state.prev_az),
                    seg,
                )
                audio = crossfade(prev_head, audio, scene.sampling_rate)
        has_d = (state.distractor_sound_id >= 0) & (
            state.distractor_slot >= 0
        )
        return jnp.where(has_d, audio, 0.0)

    def _bank_rir(self, scene, state, node, az):
        rir = scene.rir[az, node, state.goal_slot]
        if rir.dtype != jnp.float32:
            rir = rir.astype(jnp.float32)
        return rir

    def _seg_spectra(self, scene, state):
        """Delay-line spectra of this step's source window — computed ONCE
        per step and shared by the current and crossfade-previous
        convolutions (both read the same sample cursor). Uses the
        contiguous-slice path over the wrap-extended source bank when the
        scene carries one (the per-sample modulo gather it replaces was the
        measured bottleneck of the whole continuous step on TPU)."""
        cfg = self.config
        sr = scene.sampling_rate
        num_sample = int(round(cfg.step_time * sr))
        if (
            cfg.quantized_cursor
            and scene.seg_step_fft is not None
            and scene.step_window == num_sample
        ):
            # quantized-cursor fast path: the spectra are a table GATHER
            # (the cursor only ever visits window boundaries)
            return scene.seg_step_fft[
                state.sound_id, state.sample_index // num_sample
            ]
        if scene.sounds_ext is not None:
            return segment_block_ffts_from_ext(
                scene.sounds_ext[state.sound_id], state.sample_index,
                num_sample, scene.rir_max_len, scene.conv_block,
            )
        src = _sound_of(scene, state.sound_id)
        true_len = (
            jnp.maximum(scene.sound_lengths_sec[state.sound_id], 1) * sr
        )
        return segment_block_ffts_from_source(
            src, state.sample_index, num_sample, scene.rir_max_len,
            scene.conv_block, length=true_len, wrap=True,
        )

    def _render_audio(self, scene, state, rir, seg):
        cfg = self.config
        sr = scene.sampling_rate
        num_sample = int(round(cfg.step_time * sr))
        audio = partitioned_windowed_convolve(
            seg, rir, num_sample, scene.conv_block
        )
        # zero-pad to 1 s like the reference (continuous_simulator.py:454)
        return jnp.pad(audio, ((0, 0), (0, sr - num_sample)))

    def _render_audio_head(self, scene, rir, seg):
        """Only the crossfade head ([C, fade_samples]) of conv(source, rir)
        — the previous-step RIR's audio never contributes past the 50 ms
        fade (crossfade keeps x2 afterwards), so its convolution needs just
        the FIRST output block: t_out=1, i.e. the first P segment blocks."""
        from soundspaces_tpu.ops.crossfade import fade_samples
        from soundspaces_tpu.ops.partitioned import num_partitions

        p = num_partitions(scene.rir_max_len, scene.conv_block)
        n = fade_samples(scene.sampling_rate)
        assert n <= scene.conv_block, "fade must fit one output block"
        return partitioned_windowed_convolve(
            seg[:p], rir, n, scene.conv_block
        )

    def _render_audio_fft(self, scene, state, rir_fft, seg):
        """Bank-mode fast path: convolve against PRECOMPUTED RIR partition
        spectra (scene.rir_part_fft) — no per-step forward RIR FFTs."""
        cfg = self.config
        sr = scene.sampling_rate
        num_sample = int(round(cfg.step_time * sr))
        audio = partitioned_windowed_convolve_fft(
            seg, rir_fft, num_sample, scene.conv_block
        )
        return jnp.pad(audio, ((0, 0), (0, sr - num_sample)))

    def _observe(self, scene, state):
        cfg = self.config
        node = self._nearest_node(scene, state.x, state.z)
        az = self._az_idx(state.heading)
        fresh_mode = cfg.rir_source in FRESH_RIR_SOURCES
        seg = self._seg_spectra(scene, state)
        use_fft_bank = not fresh_mode and scene.rir_part_fft is not None
        xf = cfg.use_crossfade
        # the current RIR renders the full window; the PREVIOUS RIR renders
        # only the 50 ms crossfade head (its audio never contributes past
        # the fade) — one full 2-ch convolve + one single-block 2-ch head
        # instead of a 4-ch full convolve
        prev_head = None
        if fresh_mode:
            audio = self._render_audio(scene, state, state.rir, seg)
            if xf:
                prev_head = self._render_audio_head(
                    scene, state.prev_rir, seg
                )
        elif use_fft_bank:
            from soundspaces_tpu.ops.partitioned import gather_part_fft

            gather = lambda a, n: gather_part_fft(
                scene.rir_part_fft,
                lambda plane: plane[a, n, state.goal_slot],
            )
            h = gather(az, node)
            if xf:
                hp = gather(state.prev_az, state.prev_node)
                h = jnp.concatenate([hp, h], axis=0)
            audio = self._render_audio_fft(scene, state, h, seg)
            if xf:
                audio = crossfade(audio[:2], audio[2:], scene.sampling_rate)
        else:
            rir = self._bank_rir(scene, state, node, az)
            audio = self._render_audio(scene, state, rir, seg)
            if xf:
                prev_head = self._render_audio_head(
                    scene,
                    self._bank_rir(scene, state, state.prev_node,
                                   state.prev_az),
                    seg,
                )
        if prev_head is not None:
            audio = crossfade(prev_head, audio, scene.sampling_rate)
        if cfg.has_distractor_sound:
            # distractor source convolved with its own pose RIR and mixed in
            # (simulator.py:649-664; crossfade is linear so summing the
            # crossfaded signals equals crossfading the sum)
            audio = audio + self._distractor_audio(scene, state)
        if not cfg.everlasting:
            # silence once past the sounding object's duration
            # (semantic task; simulator.py:610-612)
            elapsed = state.step_count.astype(jnp.float32) * cfg.step_time
            audible = elapsed <= state.duration_sec.astype(jnp.float32)
            audio = audio * audible
        obs = {}
        if "audiogoal" in cfg.sensors:
            obs["audiogoal"] = audio
        if "spectrogram" in cfg.sensors:
            # the convolve window is only step_time long; frames past it are
            # exactly zero and skipped by the STFT (identical output)
            obs["spectrogram"] = spectrogram(
                audio,
                nonzero_len=int(round(cfg.step_time * scene.sampling_rate)),
            )
        if "category" in cfg.sensors:
            obs["category"] = jax.nn.one_hot(
                state.category, cfg.num_categories
            )
        if "pointgoal_with_gps_compass" in cfg.sensors:
            dx = scene.points[state.goal_node, 0] - state.x
            dz = scene.points[state.goal_node, 2] - state.z
            rho = jnp.sqrt(dx * dx + dz * dz)
            phi = jnp.arctan2(dz, dx) - state.heading
            phi = jnp.mod(phi + jnp.pi, 2 * jnp.pi) - jnp.pi
            obs["pointgoal_with_gps_compass"] = jnp.stack([rho, phi])
        for name in cfg.sensors:
            if name == "depth" and cfg.live_depth:
                obs[name] = self._live_depth(scene, state, node)
            elif name in scene.frames:
                rot = jnp.round((270.0 - jnp.rad2deg(state.heading)) / 90.0)
                obs[name] = scene.frames[name][node, rot.astype(jnp.int32) % 4]
        return obs

    def _live_depth(self, scene, state, node):
        """Pose-exact depth via the on-device raycaster (ops/raycast.py) —
        the habitat-sim renderer role without a frame cache. The occupancy
        grid is node-anchored, so the camera's grid position is the node's
        cell plus the continuous offset from that node."""
        from soundspaces_tpu.ops.raycast import render_depth

        res = self.scene.egomap_resolution
        gx = scene.node_grid_xz[node, 0].astype(jnp.float32) * res + (
            state.x - scene.points[node, 0]
        )
        gz = scene.node_grid_xz[node, 1].astype(jnp.float32) * res + (
            state.z - scene.points[node, 2]
        )
        return render_depth(
            scene.occupancy, gx, gz, state.heading,
            height=self.config.depth_size, width=self.config.depth_size,
            resolution=res,
        )


def _sound_of(scene, sound_id):
    """Full (padded) waveform of one sound. Requires raw sounds on device."""
    return scene.sounds[sound_id]
