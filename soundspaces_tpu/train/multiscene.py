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


def _pad_to(arr: np.ndarray, shape: tuple[int, ...]) -> np.ndarray:
    pads = [(0, t - s) for s, t in zip(arr.shape, shape)]
    return np.pad(arr, pads)


def stack_scenes(assets_list: Sequence[SceneAssets]) -> DeviceScene:
    """Stack per-scene assets into one DeviceScene whose every array has a
    leading scene axis, padded to the largest scene. Geodesic padding uses
    UNREACHABLE so padded nodes are never routed through."""
    from soundspaces_tpu.scene.graph import UNREACHABLE

    scenes = [DeviceScene.from_assets(a) for a in assets_list]
    n_max = max(s.points.shape[0] for s in scenes)
    g_max = max(s.rir.shape[2] for s in scenes)

    def stack(get, fill=0):
        arrs = [np.asarray(get(s)) for s in scenes]
        target = tuple(max(a.shape[i] for a in arrs) for i in range(arrs[0].ndim))
        out = []
        for a in arrs:
            if fill != 0:
                padded = np.full(target, fill, a.dtype)
                padded[tuple(slice(0, d) for d in a.shape)] = a
                out.append(padded)
            else:
                out.append(_pad_to(a, target))
        return jnp.asarray(np.stack(out))

    first = scenes[0]
    assert all(s.sampling_rate == first.sampling_rate for s in scenes)
    assert all(s.rir_max_len == first.rir_max_len for s in scenes)
    frames = {
        k: stack(lambda s, k=k: s.frames[k]) for k in first.frames
    }
    return DeviceScene(
        occupancy=stack(lambda s: s.occupancy),
        node_grid_xz=stack(lambda s: s.node_grid_xz),
        points=stack(lambda s: s.points),
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
        sound_lengths_sec=stack(lambda s: s.sound_lengths_sec),
        frames=frames,
        grid_size=first.grid_size,
        sampling_rate=first.sampling_rate,
        rir_max_len=first.rir_max_len,
        conv_block=first.conv_block,
    )


def stack_episode_banks(banks: Sequence[EpisodeBank]) -> EpisodeBank:
    """Stack per-scene episode banks along a leading scene axis (episode
    counts padded by cycling — sampling is uniform anyway)."""
    e_max = max(b.num_episodes for b in banks)

    def stack(get, fill=0):
        arrs = []
        for b in banks:
            a = np.asarray(get(b))
            reps = -(-e_max // a.shape[0])
            arrs.append(np.tile(a, (reps,) + (1,) * (a.ndim - 1))[:e_max])
        # pad ragged trailing dims (e.g. per-scene view-point counts)
        target = tuple(
            max(a.shape[d] for a in arrs) for d in range(1, arrs[0].ndim)
        )
        padded = []
        for a in arrs:
            out = np.full((e_max,) + target, fill, a.dtype)
            out[(slice(None),) + tuple(slice(0, s) for s in a.shape[1:])] = a
            padded.append(out)
        return jnp.asarray(np.stack(padded))

    return EpisodeBank(
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


def scene_sharded_train_step(mesh, step_fn, num_envs: int, num_scenes: int):
    """Like parallel.data_parallel_step but the scene/episode banks shard
    their leading scene axis over 'dp' (one scene per shard when
    num_scenes == mesh size). Inside the shard the local leading axis is
    squeezed so the per-scene env code sees unbatched banks."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from soundspaces_tpu.train.parallel import DP_AXIS

    n_dev = mesh.devices.size
    assert num_scenes % n_dev == 0 and num_scenes == n_dev, (
        "v1 scene sharding places exactly one scene per device"
    )

    def spec_for_carry(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == num_envs:
            return P(DP_AXIS, *([None] * (x.ndim - 1)))
        return P()

    def sharded_fn(params, opt_state, carry, rng, clip, scene, episodes):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DP_AXIS))
        carry = carry.replace(
            rng=jax.random.fold_in(carry.rng, jax.lax.axis_index(DP_AXIS))
        )
        scene = jax.tree.map(lambda x: x[0], scene)  # squeeze local scene
        episodes = jax.tree.map(lambda x: x[0], episodes)
        return step_fn(params, opt_state, carry, rng, clip, scene, episodes)

    def wrapped(params, opt_state, carry, rng, clip, scene, episodes):
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
            in_specs=(P(), P(), carry_specs, P(), P(), scene_spec, ep_spec),
            out_specs=(P(), P(), carry_specs, P()),
            check_rep=False,
        )(params, opt_state, carry, rng, clip, scene, episodes)

    return wrapped
