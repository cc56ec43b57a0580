"""Agent benchmark harness — the reference Benchmark.evaluate loop
(soundspaces/benchmark.py:119-168, ss_baselines/common/benchmark.py:28-105):
run an agent for N episodes, average end-of-episode metrics. Batched: all
envs run simultaneously, finished episodes accumulate until the count is
reached."""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from soundspaces_tpu.env.audionav import AudioNavEnv


class Benchmark:
    def __init__(self, env: AudioNavEnv):
        self.env = env

        def _step(scene, episodes, state, obs, key, agent_fn):
            actions = agent_fn(key, obs)
            return self.env.step_pure(scene, episodes, state, actions)

        self._step = _step

    def evaluate(
        self,
        agent_fn: Callable,
        num_episodes: int = 100,
        seed: int = 0,
        max_steps: int | None = None,
    ) -> dict[str, float]:
        env = self.env
        rng = jax.random.PRNGKey(seed)
        rng, reset_key = jax.random.split(rng)
        state, obs = env.reset(reset_key)

        step = jax.jit(
            lambda sc, ep, st, ob, k: self._step(sc, ep, st, ob, k, agent_fn)
        )

        totals: dict[str, float] = {}
        count = 0
        max_steps = max_steps or (
            env.config.max_episode_steps * (num_episodes // env.num_envs + 2)
        )
        for _ in range(max_steps):
            rng, key = jax.random.split(rng)
            state, obs, _, done, info = step(
                env.scene, env.episodes, state, obs, key
            )
            d = np.asarray(done)
            if d.any():
                fetched = jax.device_get(info)
                for i in np.nonzero(d)[0]:
                    if count >= num_episodes:
                        break
                    count += 1
                    for k, v in fetched.items():
                        totals[k] = totals.get(k, 0.0) + float(v[i])
            if count >= num_episodes:
                break
        return {k: v / max(count, 1) for k, v in totals.items()} | {
            "episode_count": float(count)
        }


def run_benchmark(cfg, agents: tuple[str, ...] = ("random", "forward_only",
                                                  "random_forward", "goal_follower",
                                                  "oracle"),
                  num_episodes: int = 50) -> dict[str, dict[str, float]]:
    """CLI entry: evaluate all scripted agents (simple_agents.py __main__)."""
    import dataclasses as dc

    from soundspaces_tpu.builder import build_env
    from soundspaces_tpu.eval.agents import AGENTS

    needed = ("spectrogram", "pointgoal_with_gps_compass", "oracle_action")
    env_cfg = dc.replace(
        cfg.env,
        sensors=tuple(dict.fromkeys(cfg.env.sensors + needed)),
        episode_sampling="sequential",
    )
    cfg = dc.replace(cfg, env=env_cfg)
    env = build_env(cfg, sequential=True)
    bench = Benchmark(env)
    return {
        name: bench.evaluate(AGENTS[name], num_episodes=num_episodes)
        for name in agents
    }
