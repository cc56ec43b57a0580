"""AV-WaN PPO trainer: masked waypoint policy over the hierarchical env.

Reference: ss_baselines/av_wan/ppo/ppo_trainer.py:42-751 — PPO where env
steps take waypoint indices, the categorical head is masked by the action
map, and an exponential-lr-decay option exists (av_wan/config/default.py:
96-97). One jitted update: waypoint rollout scan -> GAE -> masked PPO
epochs."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax
from flax import struct

from soundspaces_tpu.avwan.env import WaypointNavEnv
from soundspaces_tpu.avwan.policy import AVWanNet
from soundspaces_tpu.models.policy import CategoricalPolicy
from soundspaces_tpu.train.ppo import PPOConfig, compute_gae, normalize_advantages


@struct.dataclass
class WanCarry:
    env_state: object
    obs: dict
    hidden: jax.Array
    prev_done: jax.Array
    rng: jax.Array


class AVWanTrainer:
    def __init__(self, env: WaypointNavEnv, ppo_cfg: PPOConfig,
                 use_gm: bool = True, use_am: bool = True):
        self.env = env
        self.ppo = ppo_cfg
        self.policy = CategoricalPolicy(
            net=AVWanNet(hidden_size=ppo_cfg.hidden_size, use_gm=use_gm,
                         use_am=use_am),
            num_actions=env.wp.num_waypoints,
        )
        if ppo_cfg.use_linear_lr_decay:
            sched = optax.linear_schedule(ppo_cfg.lr, 0.0, 10_000)
        else:
            sched = ppo_cfg.lr
        self.optimizer = optax.adam(sched, eps=ppo_cfg.eps)

    def init_state(self, rng):
        rng, env_key, p_key = jax.random.split(rng, 3)
        env_state, obs = self.env.reset(env_key)
        hidden = jnp.zeros((self.env.num_envs, self.ppo.hidden_size))
        params = self.policy.init(
            p_key, obs, hidden, jnp.ones(self.env.num_envs)
        )
        opt_state = self.optimizer.init(params)
        carry = WanCarry(
            env_state=env_state, obs=obs, hidden=hidden,
            prev_done=jnp.zeros(self.env.num_envs, bool), rng=rng,
        )
        return params, opt_state, carry

    def _mask(self, obs):
        n = obs["action_map"].shape[0]
        return obs["action_map"].reshape(n, -1)

    def make_train_step(self, axis_name: str | None = None):
        ppo = self.ppo

        def step(params, opt_state, carry, rng, clip, scene, episodes, tables):
            def one_step(c: WanCarry, _):
                rng2, key = jax.random.split(c.rng)
                masks = 1.0 - c.prev_done.astype(jnp.float32)
                amask = self._mask(c.obs)
                action, logp, value, hidden = self.policy.apply(
                    params, c.obs, c.hidden, masks, key, False, amask,
                    method=self.policy.act,
                )
                env_state, obs, reward, done, info = self.env.step_pure(
                    scene, episodes, tables, c.env_state, action
                )
                out = dict(obs=c.obs, actions=action, log_probs=logp,
                           values=value, rewards=reward, masks=masks,
                           dones=done, infos=info)
                return WanCarry(env_state, obs, hidden, done, rng2), out

            init_hidden = carry.hidden
            carry2, traj = jax.lax.scan(one_step, carry, None, length=ppo.num_steps)
            last_masks = 1.0 - carry2.prev_done.astype(jnp.float32)
            last_value = self.policy.apply(
                params, carry2.obs, carry2.hidden, last_masks,
                self._mask(carry2.obs), method=self.policy.get_value,
            )
            adv, returns = compute_gae(
                traj["rewards"], traj["values"], traj["dones"], last_value,
                ppo.gamma, ppo.tau,
            )
            adv = normalize_advantages(adv, axis_name)

            def loss_fn(p):
                t, n = traj["actions"].shape
                amask = self._mask(
                    jax.tree.map(lambda o: o.reshape((t * n,) + o.shape[2:]),
                                 traj["obs"])
                ).reshape(t, n, -1)
                logp, entropy, values, _ = self.policy.apply(
                    p, traj["obs"], init_hidden, traj["masks"],
                    traj["actions"], amask,
                    method=self.policy.evaluate_actions,
                )
                ratio = jnp.exp(logp - traj["log_probs"])
                s1 = ratio * adv
                s2 = jnp.clip(ratio, 1 - clip, 1 + clip) * adv
                action_loss = -jnp.minimum(s1, s2).mean()
                vc = traj["values"] + jnp.clip(values - traj["values"], -clip, clip)
                value_loss = 0.5 * jnp.maximum(
                    (values - returns) ** 2, (vc - returns) ** 2
                ).mean()
                ent = entropy.mean()
                total = (action_loss + ppo.value_loss_coef * value_loss
                         - ppo.entropy_coef * ent)
                return total, {"action_loss": action_loss,
                               "value_loss": value_loss, "entropy": ent}

            def epoch(c, key):
                p, o = c
                grads, metrics = jax.grad(loss_fn, has_aux=True)(p)
                if axis_name is not None:
                    grads = jax.lax.pmean(grads, axis_name)
                gn = optax.global_norm(grads)
                scale = jnp.minimum(1.0, ppo.max_grad_norm / (gn + 1e-6))
                grads = jax.tree.map(lambda g: g * scale, grads)
                updates, o = self.optimizer.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), metrics

            keys = jax.random.split(rng, ppo.ppo_epoch)
            (params, opt_state), metrics = jax.lax.scan(
                epoch, (params, opt_state), keys
            )
            metrics = jax.tree.map(jnp.mean, metrics)
            done_f = traj["dones"].astype(jnp.float32)
            n_done = jnp.maximum(done_f.sum(), 1.0)
            metrics.update(
                {"reward": traj["rewards"].sum(0).mean(),
                 **{k: (v * done_f).sum() / n_done
                    for k, v in traj["infos"].items()}}
            )
            return params, opt_state, carry2, metrics

        return step
