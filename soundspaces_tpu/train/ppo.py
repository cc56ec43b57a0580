"""Clipped-surrogate PPO with GAE, as pure jittable functions.

Matches the algorithmic content of the reference PPO
(ss_baselines/av_nav/ppo/ppo.py:16-165) and its GAE return computation
(ss_baselines/common/rollout_storage.py:112-130): whole-batch advantage
normalization, ratio clipping, clipped value loss, entropy bonus, grad-norm
clipping — expressed as a scan-based GAE and a loss function differentiated
with jax.grad. Recurrent minibatching keeps time sequences intact and splits
the env axis under a permutation, like the reference's recurrent generator
(rollout_storage.py:132-225).

The distributed variant (DD-PPO, av_nav/ddppo/ddppo.py:18-55) normalizes
advantages and reduces gradients across workers; under `shard_map` both are
`psum`s — see train/parallel.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from soundspaces_tpu.train.rollout import Rollout


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Defaults follow the reference's Replica AudioGoal recipe
    (ss_baselines/av_nav/config/audionav/replica/train_telephone/
    audiogoal_depth.yaml)."""

    clip_param: float = 0.1
    ppo_epoch: int = 4
    num_mini_batch: int = 1
    value_loss_coef: float = 0.5
    entropy_coef: float = 0.2
    lr: float = 2.5e-4
    eps: float = 1e-5
    max_grad_norm: float = 0.5
    num_steps: int = 150
    hidden_size: int = 512
    gamma: float = 0.99
    tau: float = 0.95
    use_gae: bool = True
    use_linear_lr_decay: bool = True
    use_linear_clip_decay: bool = True
    # AV-WaN's alternative schedule: lr * exp(-lambda * update/num_updates)
    # (av_wan/config/default.py:96-97; common/utils.py:103-114). Takes
    # precedence over the linear decay when enabled.
    use_exponential_lr_decay: bool = False
    exp_decay_lambda: float = 1.0
    use_clipped_value_loss: bool = True
    reward_window_size: int = 50
    # Linear entropy-coefficient annealing entropy_coef -> final_entropy_coef
    # over num_updates. The reference trains with a fixed coefficient
    # (0.02-0.25 depending on recipe, av_nav/ppo/ppo.py:47); on long-horizon
    # worlds a high initial coefficient aids exploration but its entropy
    # floor caps final success/SPL — annealing gives both.
    use_linear_entropy_decay: bool = False
    final_entropy_coef: float = 0.02


def make_lr_schedule(ppo: "PPOConfig", num_updates: int):
    """Learning-rate schedule in optimizer-step counts (one PPO update =
    ppo_epoch * num_mini_batch optimizer steps, mirroring the reference's
    per-update LambdaLR stepping, av_wan/ppo/ppo_trainer.py:305-316)."""
    steps_per_update = max(ppo.ppo_epoch * ppo.num_mini_batch, 1)
    if ppo.use_exponential_lr_decay:
        lam, total = ppo.exp_decay_lambda, float(max(num_updates, 1))

        def schedule(count):
            update = count // steps_per_update
            return ppo.lr * jnp.exp(-lam * update / total)

        return schedule
    if ppo.use_linear_lr_decay:
        return optax.linear_schedule(
            ppo.lr, 0.0, num_updates * steps_per_update
        )
    return ppo.lr


def compute_gae(
    rewards: jax.Array,  # [T, N]
    values: jax.Array,  # [T, N]
    dones: jax.Array,  # [T, N] bool: episode ended at t
    last_value: jax.Array,  # [N]
    gamma: float,
    tau: float,
    use_gae: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Returns (advantages [T, N], returns [T, N]). Bootstrapping is cut at
    episode boundaries: V_{t+1} contributes only when step t did not end the
    episode (the reference's mask placement, rollout_storage.py:112-130)."""
    cont = 1.0 - dones.astype(jnp.float32)

    def backward(carry, inp):
        acc, next_value = carry  # acc: GAE accumulator, or next return
        r, v, c = inp
        if use_gae:
            delta = r + gamma * next_value * c - v
            acc = delta + gamma * tau * c * acc
            ret = acc + v
        else:
            # plain discounted return (rollout_storage.py:126-130)
            ret = r + gamma * acc * c
            acc = ret
        return (acc, v), (ret - v, ret)

    (_, _), (adv, returns) = jax.lax.scan(
        backward,
        (jnp.zeros_like(last_value) if use_gae else last_value, last_value),
        (rewards, values, cont),
        reverse=True,
    )
    return adv, returns


def ppo_loss(
    params: Any,
    evaluate_actions: Callable,
    obs: dict[str, jax.Array],  # [T, B, ...]
    initial_hidden: jax.Array,  # [B, H]
    masks: jax.Array,  # [T, B]
    actions: jax.Array,  # [T, B]
    old_log_probs: jax.Array,
    old_values: jax.Array,
    advantages: jax.Array,
    returns: jax.Array,
    clip_param: jax.Array,
    cfg: PPOConfig,
    entropy_coef: jax.Array | None = None,
):
    """Reference loss terms (av_nav/ppo/ppo.py:99-135). `entropy_coef`
    optionally overrides cfg.entropy_coef with a traced scalar (annealing)."""
    log_probs, entropy, values, _ = evaluate_actions(
        params, obs, initial_hidden, masks, actions
    )
    ratio = jnp.exp(log_probs - old_log_probs)
    surr1 = ratio * advantages
    surr2 = jnp.clip(ratio, 1.0 - clip_param, 1.0 + clip_param) * advantages
    action_loss = -jnp.minimum(surr1, surr2).mean()

    if cfg.use_clipped_value_loss:
        value_pred_clipped = old_values + jnp.clip(
            values - old_values, -clip_param, clip_param
        )
        vloss = jnp.maximum(
            (values - returns) ** 2, (value_pred_clipped - returns) ** 2
        )
        value_loss = 0.5 * vloss.mean()
    else:
        value_loss = 0.5 * ((returns - values) ** 2).mean()

    entropy_mean = entropy.mean()
    ent_coef = cfg.entropy_coef if entropy_coef is None else entropy_coef
    total = (
        action_loss
        + cfg.value_loss_coef * value_loss
        - ent_coef * entropy_mean
    )
    return total, {
        "action_loss": action_loss,
        "value_loss": value_loss,
        "entropy": entropy_mean,
    }


def normalize_advantages(adv: jax.Array, axis_name: str | None = None) -> jax.Array:
    """Whole-batch advantage normalization (ppo.py:53-58); under a mesh axis
    the moments are psum-reduced across shards — exactly the DD-PPO
    distributed mean/var (av_nav/ddppo/ddppo.py:18-42)."""
    if axis_name is None:
        mean, var = adv.mean(), adv.var()
    else:
        n = adv.size * jax.lax.psum(1, axis_name)
        s = jax.lax.psum(adv.sum(), axis_name)
        mean = s / n
        var = jax.lax.psum(((adv - mean) ** 2).sum(), axis_name) / n
    return (adv - mean) / (jnp.sqrt(var) + 1e-5)


def ppo_update(
    params: Any,
    opt_state: optax.OptState,
    optimizer: optax.GradientTransformation,
    evaluate_actions: Callable,
    rollout: Rollout,
    rng: jax.Array,
    cfg: PPOConfig,
    clip_param: jax.Array,
    axis_name: str | None = None,
    entropy_coef: jax.Array | None = None,
):
    """ppo_epoch x num_mini_batch recurrent updates (av_nav/ppo/ppo.py:60-157).
    Minibatches split the env axis under a fresh permutation per epoch; grads
    are psum-averaged over `axis_name` when running under shard_map."""
    adv, returns = compute_gae(
        rollout.rewards,
        rollout.values,
        rollout.dones,
        rollout.last_value,
        cfg.gamma,
        cfg.tau,
        cfg.use_gae,
    )
    adv = normalize_advantages(adv, axis_name)

    num_envs = rollout.actions.shape[1]
    nmb = cfg.num_mini_batch
    assert num_envs % nmb == 0, "num_envs must divide num_mini_batch"
    mb_size = num_envs // nmb

    grad_fn = jax.grad(ppo_loss, has_aux=True)

    def minibatch_step(carry, env_idx):
        params, opt_state = carry
        take = lambda x: jnp.take(x, env_idx, axis=1)
        grads, metrics = grad_fn(
            params,
            evaluate_actions,
            jax.tree.map(take, rollout.obs),
            jnp.take(rollout.initial_hidden, env_idx, axis=0),
            take(rollout.masks),
            take(rollout.actions),
            take(rollout.log_probs),
            take(rollout.values),
            take(adv),
            take(returns),
            clip_param,
            cfg,
            entropy_coef,
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        grads = _clip_by_global_norm(grads, cfg.max_grad_norm)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), metrics

    def epoch_step(carry, key):
        perm = jax.random.permutation(key, num_envs).reshape(nmb, mb_size)
        return jax.lax.scan(minibatch_step, carry, perm)

    keys = jax.random.split(rng, cfg.ppo_epoch)
    (params, opt_state), metrics = jax.lax.scan(
        epoch_step, (params, opt_state), keys
    )
    metrics = jax.tree.map(jnp.mean, metrics)
    return params, opt_state, metrics


def _clip_by_global_norm(grads, max_norm: float):
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads)
