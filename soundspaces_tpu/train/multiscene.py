"""Multi-scene training: scenes sharded across the device mesh.

The reference distributes scenes round-robin across its N simulator worker
processes (ss_baselines/common/env_utils.py:65-69). The TPU-native analog:
stack per-scene banks into arrays with a leading scene axis, shard that
axis over the 'dp' mesh dimension, and run the train step under shard_map —
each device then holds exactly its own scenes' RIR/graph banks in HBM (no
replication of the heaviest state) and steps the envs assigned to those
scenes. Gradients still pmean across the mesh, so the policy trains on all
scenes jointly.

Scene heterogeneity (different node/goal counts) is handled by padding every
bank to the maximum size across scenes (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from soundspaces_tpu.env.structs import DeviceScene, EpisodeBank
from soundspaces_tpu.scene.banks import SceneAssets


def stack_scenes(assets_list: Sequence[SceneAssets]) -> DeviceScene:
    """Stack per-scene assets into one DeviceScene whose every array has a
    leading scene axis, padded to the largest scene. Geodesic padding uses
    UNREACHABLE so padded nodes are never routed through."""
    from soundspaces_tpu.scene.graph import UNREACHABLE

    scenes = [DeviceScene.from_assets(a) for a in assets_list]
    n_max = max(s.points.shape[0] for s in scenes)
    g_max = max(s.rir.shape[2] for s in scenes)

    def stack(get, fill=0, edge=False):
        # pad + stack ON DEVICE: from_assets already placed (and computed)
        # the banks device-side, and pulling them back with np.asarray is
        # a large D2H fetch — which the axon tunnel categorically rejects
        # (UNIMPLEMENTED; the r4 multiscene chip step died exactly here)
        arrs = [jnp.asarray(get(s)) for s in scenes]
        target = tuple(max(a.shape[i] for a in arrs) for i in range(arrs[0].ndim))
        out = []
        for a in arrs:
            pads = [(0, t - s_) for s_, t in zip(a.shape, target)]
            if edge:
                # replicate the last valid entry instead of zero-filling:
                # padded nodes then alias a real node, so nearest-node
                # searches, walkability checks and bbox reductions over the
                # padded axis are unaffected (phantom nodes at the origin
                # were reachable through _walkable/_nearest_node otherwise)
                out.append(jnp.pad(a, pads, mode="edge"))
            elif fill != 0:
                out.append(jnp.pad(a, pads, constant_values=fill))
            else:
                out.append(jnp.pad(a, pads))
        return jnp.stack(out)

    first = scenes[0]
    assert all(s.sampling_rate == first.sampling_rate for s in scenes)
    assert all(s.rir_max_len == first.rir_max_len for s in scenes)
    frames = {
        k: stack(lambda s, k=k: s.frames[k]) for k in first.frames
    }
    return DeviceScene(
        occupancy=stack(lambda s: s.occupancy),
        node_grid_xz=stack(lambda s: s.node_grid_xz, edge=True),
        points=stack(lambda s: s.points, edge=True),
        forward_neighbor=stack(lambda s: s.forward_neighbor, fill=-1),
        geodesic_hops=stack(lambda s: s.geodesic_hops, fill=int(UNREACHABLE)),
        oracle_next=stack(lambda s: s.oracle_next, fill=-1),
        rir=stack(lambda s: s.rir),
        goal_slot_of_node=stack(lambda s: s.goal_slot_of_node, fill=-1),
        proximity=stack(lambda s: s.proximity),
        instance_to_mpcat=(
            stack(lambda s: s.instance_to_mpcat)
            if first.instance_to_mpcat is not None
            else None
        ),
        seg_fft=stack(lambda s: s.seg_fft),
        seg_block_fft=stack(lambda s: s.seg_block_fft),
        sounds=stack(lambda s: s.sounds),
        sounds_ext=stack(lambda s: s.sounds_ext),
        sound_lengths_sec=stack(lambda s: s.sound_lengths_sec),
        frames=frames,
        grid_size=first.grid_size,
        sampling_rate=first.sampling_rate,
        rir_max_len=first.rir_max_len,
        conv_block=first.conv_block,
    )


def stack_episode_banks(banks: Sequence[EpisodeBank]) -> EpisodeBank:
    """Stack per-scene episode banks along a leading scene axis. Episode
    counts are padded by cycling (fine for uniform training sampling); a
    per-slot `valid` mask marks the cycled duplicates so sequential eval
    never re-scores a smaller scene's episodes (the reference's eval walks
    each scene's episode list exactly once, base_trainer.py eval flow)."""
    e_max = max(b.num_episodes for b in banks)

    def stack(get, fill=0):
        # stays on device end-to-end (see stack_scenes: np.asarray of a
        # device array is a D2H fetch the axon tunnel rejects)
        arrs = []
        for b in banks:
            a = jnp.asarray(get(b))
            reps = -(-e_max // a.shape[0])
            arrs.append(jnp.tile(a, (reps,) + (1,) * (a.ndim - 1))[:e_max])
        # pad ragged trailing dims (e.g. per-scene view-point counts)
        target = tuple(
            max(a.shape[d] for a in arrs) for d in range(1, arrs[0].ndim)
        )
        padded = []
        for a in arrs:
            pads = [(0, 0)] + [
                (0, t - s) for s, t in zip(a.shape[1:], target)
            ]
            padded.append(jnp.pad(a, pads, constant_values=fill))
        return jnp.stack(padded)

    valid = jnp.stack(
        [
            (jnp.arange(e_max) < b.num_episodes)
            & (
                jnp.asarray(b.valid)[jnp.arange(e_max) % b.num_episodes]
                if b.valid is not None
                else jnp.ones(e_max, bool)
            )
            for b in banks
        ]
    )
    return EpisodeBank(
        valid=valid,
        viewpoint_nodes=stack(
            lambda b: getattr(b, "viewpoint_nodes"), fill=-1
        ),
        **{
            f: stack(lambda b, f=f: getattr(b, f))
            for f in (
                "start_node", "start_rot_idx", "goal_node", "goal_slot",
                "sound_id", "geodesic", "oracle_num_action", "duration_sec",
                "offset_sec", "category", "distractor_sound_id",
                "distractor_slot",
            )
        }
    )


class MultiSceneEnv:
    """Single-device multi-scene env: the env batch is statically grouped
    over the scene axis — group g's envs live in scene g — the TPU-native
    form of the reference's round-robin scene distribution across simulator
    workers (ss_baselines/common/env_utils.py:65-69; a reference worker's
    scene set is likewise fixed for the whole run).

    All scenes' banks are resident in HBM (leading scene axis, padded by
    stack_scenes); the group dispatch is a static Python loop, so each
    group's bank access is a free view — no dynamic scene gathers on the
    hot path. Exposes the same reset/step/step_pure surface as AudioNavEnv
    and drops into PPOTrainer unchanged. Works with the continuous env too
    (base_cls=ContinuousAudioNavEnv, bank/parametric RIR sources)."""

    def __init__(
        self,
        config,
        scene: DeviceScene,
        episodes: EpisodeBank,
        num_envs: int,
        base_cls=None,
    ):
        from soundspaces_tpu.env.audionav import AudioNavEnv

        self.num_scenes = int(scene.points.shape[0])
        assert num_envs >= self.num_scenes, (
            f"num_envs={num_envs} < num_scenes={self.num_scenes}: every "
            "scene needs at least one env (the reference likewise assigns "
            "each worker at least one scene, env_utils.py:36-69)"
        )
        # round-robin env distribution: when num_envs doesn't divide evenly
        # the first (num_envs % num_scenes) scenes take one extra env —
        # group sizes differ by at most 1, like the reference's scene
        # round-robin over workers (env_utils.py:65-69)
        n, r = divmod(num_envs, self.num_scenes)
        self.group_sizes = [n + 1] * r + [n] * (self.num_scenes - r)
        self.group_offsets = np.concatenate(
            [[0], np.cumsum(self.group_sizes)]
        ).astype(np.int32)
        self.num_envs = num_envs
        self.scene = scene
        self.episodes = episodes
        scene0 = jax.tree.map(lambda x: x[0], scene)
        ep0 = jax.tree.map(lambda x: x[0], episodes)
        # base_cls: AudioNavEnv (default) or ContinuousAudioNavEnv with
        # rir_source in ("bank", "parametric") — per-step host tracers and
        # per-scene neural fields don't group-dispatch. One base env per
        # distinct group size (at most two): the base's num_envs drives the
        # sequential episode-cursor stride, which must match the group.
        cls = base_cls or AudioNavEnv
        self._bases = {
            sz: cls(config, scene0, ep0, sz) for sz in set(self.group_sizes)
        }
        self.base = self._bases[self.group_sizes[0]]
        self.config = self.base.config
        self._reset_jit = jax.jit(self.reset_pure)
        self._step_jit = jax.jit(self.step_pure)

    @property
    def observation_shapes(self):
        return self.base.observation_shapes

    def reset(self, rng):
        keys = jax.random.split(rng, self.num_envs)
        env_ids = jnp.arange(self.num_envs, dtype=jnp.int32)
        return self._reset_jit(self.scene, self.episodes, keys, env_ids)

    def step(self, state, actions):
        return self._step_jit(self.scene, self.episodes, state, actions)

    def _dispatch(self, method, scene, episodes, *per_env):
        outs = []
        for g in range(self.num_scenes):  # static: banks are free views
            lo = int(self.group_offsets[g])
            hi = int(self.group_offsets[g + 1])
            sc = jax.tree.map(lambda x: x[g], scene)
            ep = jax.tree.map(lambda x: x[g], episodes)
            args = [jax.tree.map(lambda x: x[lo:hi], x) for x in per_env]
            fn = getattr(self._bases[self.group_sizes[g]], method)
            outs.append(fn(sc, ep, *args))
        # groups may be unequal (round-robin remainder) — concatenate, not
        # stack+reshape
        return jax.tree.map(
            lambda *xs: jnp.concatenate([jnp.atleast_1d(x) for x in xs]),
            *outs,
        )

    def reset_pure(self, scene, episodes, keys, env_ids):
        # env_ids localize per group so each group walks its own episodes
        # (env batch order is group-blocked: group g owns the contiguous
        # slice [offsets[g], offsets[g+1]))
        offs = jnp.asarray(
            np.repeat(self.group_offsets[:-1], self.group_sizes),
            dtype=env_ids.dtype,
        )
        local_ids = env_ids - offs
        return self._dispatch(
            "reset_pure", scene, episodes, keys, local_ids
        )

    def step_pure(self, scene, episodes, state, actions):
        return self._dispatch(
            "step_pure", scene, episodes, state, actions
        )


def scene_sharded_train_step(mesh, step_fn, num_envs: int, num_scenes: int):
    """Like parallel.data_parallel_step but the scene/episode banks shard
    their leading scene axis over 'dp'. With num_scenes == mesh size each
    shard squeezes its single scene (plain AudioNavEnv step_fn); with
    num_scenes == k * mesh size each shard keeps its local [k, ...] scene
    axis and the step_fn must come from a trainer over a MultiSceneEnv with
    k scenes (the reference's many-scenes-per-worker round-robin,
    env_utils.py:65-69)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from soundspaces_tpu.train.parallel import DP_AXIS

    n_dev = mesh.devices.size
    assert num_scenes % n_dev == 0, (
        f"num_scenes={num_scenes} must be a multiple of the mesh size {n_dev}"
    )
    scenes_per_shard = num_scenes // n_dev

    def spec_for_carry(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == num_envs:
            return P(DP_AXIS, *([None] * (x.ndim - 1)))
        return P()

    def sharded_fn(params, opt_state, carry, rng, clip, ent, scene, episodes):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DP_AXIS))
        carry = carry.replace(
            rng=jax.random.fold_in(carry.rng, jax.lax.axis_index(DP_AXIS))
        )
        if scenes_per_shard == 1:
            scene = jax.tree.map(lambda x: x[0], scene)  # squeeze local scene
            episodes = jax.tree.map(lambda x: x[0], episodes)
        return step_fn(
            params, opt_state, carry, rng, clip, ent, scene, episodes
        )

    def wrapped(params, opt_state, carry, rng, clip, ent, scene, episodes):
        carry_specs = jax.tree.map(spec_for_carry, carry)
        scene_spec = jax.tree.map(
            lambda x: P(DP_AXIS, *([None] * (x.ndim - 1))), scene
        )
        ep_spec = jax.tree.map(
            lambda x: P(DP_AXIS, *([None] * (x.ndim - 1))), episodes
        )
        return shard_map(
            sharded_fn,
            mesh=mesh,
            in_specs=(
                P(), P(), carry_specs, P(), P(), P(), scene_spec, ep_spec,
            ),
            out_specs=(P(), P(), carry_specs, P()),
            check_rep=False,
        )(params, opt_state, carry, rng, clip, ent, scene, episodes)

    return wrapped
