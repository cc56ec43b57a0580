"""Scripted agents: environment sanity checks without a learned model.

The reference's simple_agents (ss_baselines/common/simple_agents.py:23-158):
RandomAgent, ForwardOnlyAgent, RandomForwardAgent, GoalFollower. Here each is
a pure function (rng, obs) -> batched actions so it drops into the same
jitted stepping loop as learned policies. The OracleAgent wraps the
oracle-action sensor (the ShortestPathFollower equivalent,
soundspaces/tasks/shortest_path_follower.py:23-93)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from soundspaces_tpu.scene.graph import MOVE_FORWARD, STOP


class _Agent:
    name = "base"

    def __call__(self, rng: jax.Array, obs: dict) -> jax.Array:
        raise NotImplementedError


class RandomAgent(_Agent):
    """Uniform over all 4 actions, STOP included."""

    name = "random"

    def __call__(self, rng, obs):
        n = obs[next(iter(obs))].shape[0]
        return jax.random.randint(rng, (n,), 0, 4)


class ForwardOnlyAgent(_Agent):
    name = "forward_only"

    def __call__(self, rng, obs):
        n = obs[next(iter(obs))].shape[0]
        return jnp.full((n,), MOVE_FORWARD, jnp.int32)


class RandomForwardAgent(_Agent):
    """80% forward, else a random turn (simple_agents.py:58-76)."""

    name = "random_forward"

    def __call__(self, rng, obs):
        n = obs[next(iter(obs))].shape[0]
        k1, k2 = jax.random.split(rng)
        fwd = jax.random.uniform(k1, (n,)) < 0.8
        turn = jax.random.randint(k2, (n,), 2, 4)
        return jnp.where(fwd, MOVE_FORWARD, turn)


class GoalFollowerAgent(_Agent):
    """Steers toward the pointgoal: stop when at goal, forward when roughly
    facing it, else turn toward it (simple_agents.py:108-158)."""

    name = "goal_follower"
    angle_threshold = jnp.deg2rad(15.0)

    def __call__(self, rng, obs):
        rho, phi = obs["pointgoal_with_gps_compass"][..., 0], obs[
            "pointgoal_with_gps_compass"
        ][..., 1]
        at_goal = rho < 1e-3
        facing = jnp.abs(phi) < self.angle_threshold
        turn = jnp.where(phi > 0, 3, 2)  # phi>0: goal to the right -> TURN_RIGHT
        act = jnp.where(facing, MOVE_FORWARD, turn)
        return jnp.where(at_goal, STOP, act).astype(jnp.int32)


class OracleAgent(_Agent):
    name = "oracle"

    def __call__(self, rng, obs):
        return obs["oracle_action"][..., 0].astype(jnp.int32)


AGENTS = {
    a.name: a
    for a in (
        RandomAgent(),
        ForwardOnlyAgent(),
        RandomForwardAgent(),
        GoalFollowerAgent(),
        OracleAgent(),
    )
}
