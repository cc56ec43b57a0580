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
    # optional running visual-input normalizer state (models/resnet.py
    # NormStats — the reference's RunningMeanAndVar buffers). Updated every
    # rollout step; None disables normalization.
    norm_stats: Any = None


def collect_rollout(
    policy_apply: Callable,
    params: Any,
    env: AudioNavEnv,
    scene: Any,
    episodes: Any,
    carry: RolloutCarry,
    num_steps: int,
    norm_axis: str | None = None,
) -> tuple[RolloutCarry, Rollout]:
    """policy_apply(params, obs, hidden, masks, rng) -> (action, logp, value,
    hidden). Runs `num_steps` env steps entirely on device. scene/episodes
    are explicit pytree args so the caller's jit sees them as inputs, not
    baked-in constants.

    When carry.norm_stats is set, rgb/depth observations pass through the
    running mean/var normalizer: statistics fold in each batch during
    collection (the reference's training-mode RunningMeanAndVar forward,
    running_mean_and_var.py) and the NORMALIZED observations are what the
    policy — and the stored rollout the PPO epochs replay — see. norm_axis
    psums the batch moments across the data-parallel mesh axis."""

    initial_hidden = carry.hidden
    use_norm = carry.norm_stats is not None
    if use_norm:
        from soundspaces_tpu.models.resnet import normalize_visual_obs

    def one_step(c: RolloutCarry, _):
        rng, act_key = jax.random.split(c.rng)
        masks = 1.0 - c.prev_done.astype(jnp.float32)
        stats = c.norm_stats
        obs_in = c.obs
        if use_norm:
            stats, obs_in = normalize_visual_obs(
                stats, c.obs, update=True, axis_name=norm_axis
            )
        action, logp, value, hidden = policy_apply(
            params, obs_in, c.hidden, masks, act_key
        )
        env_state, obs, reward, done, info = env.step_pure(
            scene, episodes, c.env_state, action
        )
        out = dict(
            obs=obs_in,
            actions=action,
            log_probs=logp,
            values=value,
            rewards=reward,
            masks=masks,
            dones=done,
            infos=info,
        )
        return (
            RolloutCarry(env_state, obs, hidden, done, rng, stats),
            out,
        )

    carry, traj = jax.lax.scan(one_step, carry, None, length=num_steps)

    last_masks = 1.0 - carry.prev_done.astype(jnp.float32)
    last_obs = carry.obs
    if use_norm:
        _, last_obs = normalize_visual_obs(
            carry.norm_stats, carry.obs, update=False
        )
    _, _, last_value, _ = policy_apply(
        params, last_obs, carry.hidden, last_masks, carry.rng
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
