"""Multi-scene AV-WaN: waypoint training over several scenes at once.

The reference trains av_wan across scene-distributed simulator workers like
every other baseline (ss_baselines/common/env_utils.py:36-69 feeds
construct_envs for av_wan too). The TPU analog of that round-robin: one
WaypointNavEnv per scene (each with its own graph-shaped lookup tables and
egomap/intensity banks), the env batch statically partitioned over scenes
with group sizes differing by at most one, and a shared WaypointConfig whose
internal map covers the largest scene so per-env state/observation shapes
are identical across groups — group outputs then concatenate into one batch
and the trainer sees the ordinary (scene, episodes, tables, state) pure
surface with tuples in the bank slots.

Unlike MultiSceneEnv (train/multiscene.py), the per-scene banks are NOT
stacked/padded into one array: waypoint tables are graph-shaped ([N] node
coords, [Cz, Cx] cell grids, per-pose egomap banks) and padding every scene
to the largest N/C would multiply the precompute memory; the static group
dispatch makes tuples exactly as fast (each group's banks are free views).
"""

from __future__ import annotations

import types
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from soundspaces_tpu.avwan.env import (
    WaypointConfig,
    WaypointNavEnv,
    WaypointTables,
)
from soundspaces_tpu.env.structs import DeviceScene, EpisodeBank


def pad_viewpoints(banks: Sequence[EpisodeBank]) -> list[EpisodeBank]:
    """Pad every bank's viewpoint_nodes to a common [E, V_max] (-1 filled) so
    per-group EnvStates concatenate along the env axis."""
    v_max = max(int(b.viewpoint_nodes.shape[1]) for b in banks)
    out = []
    for b in banks:
        v = int(b.viewpoint_nodes.shape[1])
        if v == v_max:
            out.append(b)
            continue
        vp = jnp.pad(
            b.viewpoint_nodes, ((0, 0), (0, v_max - v)), constant_values=-1
        )
        out.append(b.replace(viewpoint_nodes=vp))
    return out


class MultiSceneWaypointEnv:
    """Scene-grouped batch of WaypointNavEnvs with a single pure surface.

    `scene`/`episodes`/`tables` flow through the trainer as TUPLES (one
    element per scene); per_env args (keys, state, waypoints) are contiguous
    group-blocked batches. Exposes the same attributes AVWanTrainer touches
    on a WaypointNavEnv: .base.scene/.base.episodes (tuples), .tables(),
    .wp, .num_envs, .reset, .step_pure.
    """

    def __init__(
        self,
        env_cfg,
        wp_cfg: WaypointConfig,
        scenes: Sequence[DeviceScene],
        episode_banks: Sequence[EpisodeBank],
        tables_list: Sequence[WaypointTables],
        num_envs: int,
    ):
        s = len(scenes)
        assert s == len(episode_banks) == len(tables_list)
        assert num_envs >= s, (
            f"num_envs={num_envs} < num_scenes={s}: every scene needs at "
            "least one env"
        )
        srs = {sc.sampling_rate for sc in scenes}
        assert len(srs) == 1, f"mixed sampling rates across scenes: {srs}"
        n, r = divmod(num_envs, s)
        self.group_sizes = [n + 1] * r + [n] * (s - r)
        self.group_offsets = np.concatenate(
            [[0], np.cumsum(self.group_sizes)]
        ).astype(np.int32)
        self.num_scenes = s
        self.num_envs = num_envs
        episode_banks = pad_viewpoints(episode_banks)
        self.envs = [
            WaypointNavEnv(env_cfg, wp_cfg, sc, ep, tb, sz)
            for sc, ep, tb, sz in zip(
                scenes, episode_banks, tables_list, self.group_sizes
            )
        ]
        self.wp = self.envs[0].wp
        self.cfg = env_cfg
        self.base = types.SimpleNamespace(
            scene=tuple(e.base.scene for e in self.envs),
            episodes=tuple(e.base.episodes for e in self.envs),
        )
        self._reset_jit = jax.jit(self.reset_pure)
        self._step_jit = jax.jit(self.step_pure)

    def tables(self):
        return tuple(e.tables() for e in self.envs)

    # ------------------------------------------------------------- public API
    def reset(self, rng):
        keys = jax.random.split(rng, self.num_envs)
        env_ids = jnp.arange(self.num_envs, dtype=jnp.int32)
        return self._reset_jit(
            self.base.scene, self.base.episodes, self.tables(), keys, env_ids
        )

    def step(self, state, waypoints):
        return self._step_jit(
            self.base.scene, self.base.episodes, self.tables(), state,
            waypoints,
        )

    # ------------------------------------------------------------------ pure
    def _dispatch(self, method, scenes, episodes, tables, *per_env):
        outs = []
        for g in range(self.num_scenes):  # static: banks are free views
            lo = int(self.group_offsets[g])
            hi = int(self.group_offsets[g + 1])
            args = [jax.tree.map(lambda x: x[lo:hi], a) for a in per_env]
            outs.append(
                getattr(self.envs[g], method)(
                    scenes[g], episodes[g], tables[g], *args
                )
            )
        return jax.tree.map(
            lambda *xs: jnp.concatenate([jnp.atleast_1d(x) for x in xs]),
            *outs,
        )

    def reset_pure(self, scenes, episodes, tables, keys, env_ids):
        offs = jnp.asarray(
            np.repeat(self.group_offsets[:-1], self.group_sizes),
            dtype=env_ids.dtype,
        )
        return self._dispatch(
            "reset_pure", scenes, episodes, tables, keys, env_ids - offs
        )

    def step_pure(self, scenes, episodes, tables, state, waypoints):
        return self._dispatch(
            "step_pure", scenes, episodes, tables, state, waypoints
        )
