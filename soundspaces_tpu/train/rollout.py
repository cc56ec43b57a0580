"""Rollout collection as a device-side scan.

Replaces RolloutStorage + _collect_rollout_step
(ss_baselines/common/rollout_storage.py:14-239,
av_nav/ppo/ppo_trainer.py:121-194): instead of a torch buffer filled step by
step over a process boundary, the whole T-step interaction is one
`lax.scan` whose stacked outputs ARE the rollout batch, already laid out
[T, N, ...] in HBM for the PPO update.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from soundspaces_tpu.env.audionav import AudioNavEnv
from soundspaces_tpu.env.structs import EnvState


@struct.dataclass
class Rollout:
    """Stacked rollout batch, time-major [T, N, ...]."""

    obs: dict[str, jax.Array]
    actions: jax.Array  # [T, N] i32
    log_probs: jax.Array  # [T, N]
    values: jax.Array  # [T, N]
    rewards: jax.Array  # [T, N]
    masks: jax.Array  # [T, N] 1.0 - done_{t-1}: hidden-state mask used at t
    dones: jax.Array  # [T, N] episode ended at step t
    infos: dict[str, jax.Array]  # [T, N] per-step measures
    initial_hidden: jax.Array  # [N, H] hidden state before step 0
    last_value: jax.Array  # [N] bootstrap value of the post-rollout obs


@struct.dataclass
class RolloutCarry:
    env_state: EnvState
    obs: dict[str, jax.Array]
    hidden: jax.Array
    prev_done: jax.Array  # [N] bool
    rng: jax.Array


def collect_rollout(
    policy_apply: Callable,
    params: Any,
    env: AudioNavEnv,
    scene: Any,
    episodes: Any,
    carry: RolloutCarry,
    num_steps: int,
) -> tuple[RolloutCarry, Rollout]:
    """policy_apply(params, obs, hidden, masks, rng) -> (action, logp, value,
    hidden). Runs `num_steps` env steps entirely on device. scene/episodes
    are explicit pytree args so the caller's jit sees them as inputs, not
    baked-in constants."""

    initial_hidden = carry.hidden

    def one_step(c: RolloutCarry, _):
        rng, act_key = jax.random.split(c.rng)
        masks = 1.0 - c.prev_done.astype(jnp.float32)
        action, logp, value, hidden = policy_apply(
            params, c.obs, c.hidden, masks, act_key
        )
        env_state, obs, reward, done, info = env.step_pure(
            scene, episodes, c.env_state, action
        )
        out = dict(
            obs=c.obs,
            actions=action,
            log_probs=logp,
            values=value,
            rewards=reward,
            masks=masks,
            dones=done,
            infos=info,
        )
        return (
            RolloutCarry(env_state, obs, hidden, done, rng),
            out,
        )

    carry, traj = jax.lax.scan(one_step, carry, None, length=num_steps)

    last_masks = 1.0 - carry.prev_done.astype(jnp.float32)
    _, _, last_value, _ = policy_apply(
        params, carry.obs, carry.hidden, last_masks, carry.rng
    )
    rollout = Rollout(
        obs=traj["obs"],
        actions=traj["actions"],
        log_probs=traj["log_probs"],
        values=traj["values"],
        rewards=traj["rewards"],
        masks=traj["masks"],
        dones=traj["dones"],
        infos=traj["infos"],
        initial_hidden=initial_hidden,
        last_value=last_value,
    )
    return carry, rollout
