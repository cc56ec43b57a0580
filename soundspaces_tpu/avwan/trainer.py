"""AV-WaN PPO trainer: masked waypoint policy over the hierarchical env.

Reference: ss_baselines/av_wan/ppo/ppo_trainer.py:42-751 — PPO where env
steps take waypoint indices, the categorical head is masked by the action
map, and an exponential-lr-decay option exists (av_wan/config/default.py:
96-97). One jitted update: waypoint rollout scan -> GAE -> masked PPO
epochs. Inherits the train()/evaluate()/checkpoint surface from
train/trainer.PPOTrainer (the BaseRLTrainer role)."""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from soundspaces_tpu.avwan.env import WaypointNavEnv
from soundspaces_tpu.avwan.policy import AVWanNet
from soundspaces_tpu.models.policy import CategoricalPolicy
from soundspaces_tpu.train.ppo import (
    PPOConfig,
    compute_gae,
    make_lr_schedule,
    normalize_advantages,
)
from soundspaces_tpu.train.trainer import PPOTrainer, TrainerConfig


@struct.dataclass
class WanCarry:
    env_state: object
    obs: dict
    hidden: jax.Array
    prev_done: jax.Array
    rng: jax.Array


class AVWanTrainer(PPOTrainer):
    def __init__(
        self,
        trainer_cfg: TrainerConfig,
        ppo_cfg: PPOConfig,
        env: WaypointNavEnv,
        eval_env: WaypointNavEnv | None = None,
        mesh=None,
        use_gm: bool = True,
        use_am: bool = True,
        bc_updates: int = 0,
        bc_beta_start: float = 1.0,
        bc_beta_final: float = 0.25,
    ):
        assert mesh is None, "AV-WaN scales via multiscene sharding (later)"
        self.cfg = trainer_cfg
        self.ppo = ppo_cfg
        self.env = env
        self.eval_env = eval_env
        self.mesh = None
        self.bc_updates = bc_updates
        self.bc_beta_start = bc_beta_start
        self.bc_beta_final = bc_beta_final
        self.policy = CategoricalPolicy(
            net=AVWanNet(hidden_size=ppo_cfg.hidden_size, use_gm=use_gm,
                         use_am=use_am),
            num_actions=env.wp.num_waypoints,
        )
        self.optimizer = optax.adam(
            make_lr_schedule(ppo_cfg, trainer_cfg.num_updates),
            eps=ppo_cfg.eps,
        )
        # the DAgger phase runs before the PPO schedule starts, so it gets
        # its own constant-lr optimizer (the shared schedule counts
        # optimizer steps and would decay through the warm-start)
        self.bc_optimizer = optax.adam(ppo_cfg.lr, eps=ppo_cfg.eps)

    def _bank_args(self):
        return (self.env.base.scene, self.env.base.episodes, self.env.tables())

    def make_phase_steps(self):
        """Waypoint rollout and PPO update as separate jitted programs for
        the env_time/pth_time profile ledger (av_nav/ppo/ppo_trainer.py:
        126-155) — same math as the fused step."""

        def rollout_fn(params, carry, scene, episodes, tables):
            return self._rollout_phase(params, carry, scene, episodes, tables)

        def update_fn(params, opt_state, bundle, rng, clip, ent):
            return self._update_phase(
                params, opt_state, bundle, rng, clip, axis_name=None,
                ent_coef=ent,
            )

        return jax.jit(rollout_fn), jax.jit(update_fn)

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

    def _rollout_phase(self, params, carry, scene, episodes, tables):
        ppo = self.ppo

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
        return carry2, dict(
            traj=traj, init_hidden=init_hidden, last_value=last_value
        )

    def _update_phase(self, params, opt_state, bundle, rng, clip,
                      axis_name=None, ent_coef=None):
        ppo = self.ppo
        traj = bundle["traj"]
        init_hidden = bundle["init_hidden"]
        adv, returns = compute_gae(
            traj["rewards"], traj["values"], traj["dones"],
            bundle["last_value"], ppo.gamma, ppo.tau,
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
            ec = ppo.entropy_coef if ent_coef is None else ent_coef
            total = (action_loss + ppo.value_loss_coef * value_loss
                     - ec * ent)
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
        return params, opt_state, metrics

    def make_train_step(self, axis_name: str | None = None):
        def step(params, opt_state, carry, rng, clip, ent_coef, scene,
                 episodes, tables):
            carry2, bundle = self._rollout_phase(
                params, carry, scene, episodes, tables
            )
            params, opt_state, metrics = self._update_phase(
                params, opt_state, bundle, rng, clip, axis_name, ent_coef
            )
            return params, opt_state, carry2, metrics

        return step

    # -------------------------------------------------- DAgger warm-start
    # The round-5 policy probe attributed AV-WaN's SPL gap to the waypoint
    # head itself: on identical states the learned distribution is mostly
    # off-path and on average goal-regressive (oracle_match 5.7%,
    # progress -3.3 vs the oracle's +7.6 hops,
    # results/avwan_policy_probe_r5.json) while the same map/mask/planner
    # machinery under an oracle chooser reaches SPL 0.731. Pure PPO cannot
    # climb out at 17 m horizons within single-chip budgets, so the trainer
    # gains a supervised warm-start: DAgger over the oracle chooser
    # (avwan/oracle.py) — execute a beta-mixture of oracle and policy
    # waypoints so the policy is supervised on ITS OWN visitation
    # distribution as beta anneals, with masked cross-entropy on the
    # oracle's choice plus a value fit on the observed returns. The
    # geodesic-hops teacher is privileged, training-time-only signal (the
    # reference trains its ShortestPathFollower-style supervision the same
    # way); eval never touches it.

    def make_bc_step(self):
        """One jitted DAgger update: beta-mixture rollout -> ppo_epoch
        passes of marginal CE over the acceptable waypoint set + value
        regression to GAE returns. The marginal (-log sum of policy mass
        on acceptable cells) rather than an exact-label CE: the oracle's
        argmin is a function of privileged geodesic tables the
        observations cannot fully disambiguate, but "some on-path
        strictly-progressing cell" is observable (see
        avwan/oracle.py::acceptable_waypoints)."""
        ppo = self.ppo
        from soundspaces_tpu.avwan.oracle import acceptable_waypoints

        def step(params, opt_state, carry, rng, beta, scene, episodes,
                 tables):
            def one_step(c: WanCarry, _):
                rng2, akey, mkey = jax.random.split(c.rng, 3)
                masks = 1.0 - c.prev_done.astype(jnp.float32)
                amask = self._mask(c.obs)
                action, _, value, hidden = self.policy.apply(
                    params, c.obs, c.hidden, masks, akey, False, amask,
                    method=self.policy.act,
                )
                labels, accept = acceptable_waypoints(
                    self.env, scene, tables, c.env_state
                )
                take = jax.random.bernoulli(mkey, beta, action.shape)
                executed = jnp.where(take, labels, action)
                env_state, obs, reward, done, info = self.env.step_pure(
                    scene, episodes, tables, c.env_state, executed
                )
                out = dict(obs=c.obs, labels=labels, accept=accept,
                           sampled=action, values=value, rewards=reward,
                           masks=masks, dones=done, infos=info)
                return WanCarry(env_state, obs, hidden, done, rng2), out

            init_hidden = carry.hidden
            carry2, traj = jax.lax.scan(
                one_step, carry, None, length=ppo.num_steps
            )
            last_masks = 1.0 - carry2.prev_done.astype(jnp.float32)
            last_value = self.policy.apply(
                params, carry2.obs, carry2.hidden, last_masks,
                self._mask(carry2.obs), method=self.policy.get_value,
            )
            _, returns = compute_gae(
                traj["rewards"], traj["values"], traj["dones"], last_value,
                ppo.gamma, ppo.tau,
            )
            t, n = traj["labels"].shape
            amask = self._mask(
                jax.tree.map(
                    lambda o: o.reshape((t * n,) + o.shape[2:]),
                    traj["obs"],
                )
            ).reshape(t, n, -1)

            def loss_fn(p):
                logp_all, values, _ = self.policy.apply(
                    p, traj["obs"], init_hidden, traj["masks"], amask,
                    method=self.policy.distribution,
                )
                marginal = jax.nn.logsumexp(
                    jnp.where(traj["accept"], logp_all, -jnp.inf), axis=-1
                )
                ce = -marginal.mean()
                v_loss = 0.5 * ((values - returns) ** 2).mean()
                probs = jnp.exp(logp_all)
                entropy = -(probs * jnp.where(
                    jnp.isfinite(logp_all), logp_all, 0.0
                )).sum(-1)
                total = ce + ppo.value_loss_coef * v_loss
                return total, {"bc_ce": ce, "value_loss": v_loss,
                               "entropy": entropy.mean()}

            def epoch(c, _):
                p, o = c
                grads, metrics = jax.grad(loss_fn, has_aux=True)(p)
                gn = optax.global_norm(grads)
                scale = jnp.minimum(1.0, ppo.max_grad_norm / (gn + 1e-6))
                grads = jax.tree.map(lambda g: g * scale, grads)
                updates, o = self.bc_optimizer.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), metrics

            (params, opt_state), metrics = jax.lax.scan(
                epoch, (params, opt_state), None, length=ppo.ppo_epoch
            )
            metrics = jax.tree.map(jnp.mean, metrics)

            done_f = traj["dones"].astype(jnp.float32)
            n_done = jnp.maximum(done_f.sum(), 1.0)
            in_accept = jnp.take_along_axis(
                traj["accept"], traj["sampled"][..., None], -1
            )[..., 0]
            metrics.update(
                bc_match=jnp.mean(
                    (traj["sampled"] == traj["labels"]).astype(jnp.float32)
                ),
                bc_acceptable=jnp.mean(in_accept.astype(jnp.float32)),
                reward=traj["rewards"].sum(0).mean(),
                **{k: (v * done_f).sum() / n_done
                   for k, v in traj["infos"].items()},
            )
            return params, opt_state, carry2, metrics

        return step

    def _bc_warmstart(self, rng, log_fn=None):
        """Run the DAgger phase from scratch and hand back a checkpoint
        path (ckpt.0) the standard PPO loop resumes from. The optimizer
        state is re-initialized at the handoff — Adam moments accumulated
        along the CE objective would bias the first PPO updates."""
        cfg = self.cfg
        rng = jax.random.fold_in(rng, 17)  # decouple from the PPO stream
        params, _, carry = self.init_state(rng)
        opt_state = self.bc_optimizer.init(params)
        step_fn = jax.jit(self.make_bc_step())
        window: list[float] = []
        t0 = time.time()
        steps_per_update = self.ppo.num_steps * self.env.num_envs
        for u in range(self.bc_updates):
            rng, key = jax.random.split(rng)
            frac = u / max(self.bc_updates - 1, 1)
            beta = (self.bc_beta_start
                    + (self.bc_beta_final - self.bc_beta_start) * frac)
            params, opt_state, carry, metrics = step_fn(
                params, opt_state, carry, key, jnp.float32(beta),
                *self._bank_args(),
            )
            if (u + 1) % cfg.log_interval == 0 or u == self.bc_updates - 1:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                window.append(m["reward"])
                window = window[-self.ppo.reward_window_size:]
                m["reward_window"] = float(np.mean(window))
                m["bc_beta"] = float(beta)
                m["phase"] = "bc"
                m["fps"] = steps_per_update * (u + 1) / (time.time() - t0)
                if log_fn:
                    log_fn(u, m)
        return self.save_checkpoint(params, self.optimizer.init(params), 0)

    def train(self, rng=None, num_updates=None, log_fn=None,
              resume_from=None, profile=False):
        if self.bc_updates > 0 and not resume_from:
            rng = (rng if rng is not None
                   else jax.random.PRNGKey(self.cfg.seed))
            resume_from = self._bc_warmstart(rng, log_fn)
        return super().train(
            rng=rng, num_updates=num_updates, log_fn=log_fn,
            resume_from=resume_from, profile=profile,
        )

    # ------------------------------------------------------------------- eval
    def evaluate(
        self,
        params,
        num_episodes: int | None = None,
        rng: jax.Array | None = None,
        max_steps: int | None = None,
        video_dir: str | None = None,
    ) -> dict[str, float]:
        """Waypoint-policy eval: one policy step = one waypoint, the inner
        planner loop runs inside env.step_pure (av_wan eval,
        ppo_trainer.py:399+)."""
        env = self.eval_env or self.env
        num_episodes = num_episodes or self.cfg.test_episode_count
        banks = env.base.episodes
        banks = banks if isinstance(banks, (tuple, list)) else (banks,)
        # per-group scored-episode quota: a group can only ever walk its own
        # scene's episode list once (the ep_valid first-pass gate enforces
        # it step-side), so the total scoreable count is the sum of the
        # groups' bank sizes
        quota = sum(
            int(np.asarray(b.valid).sum()) if b.valid is not None
            else int(b.num_episodes)
            for b in banks
        )
        if num_episodes > quota:
            print(
                f"[eval] requested {num_episodes} episodes but the eval "
                f"split holds {quota}; clamping",
                flush=True,
            )
            num_episodes = quota
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        rng, reset_key = jax.random.split(rng)
        state, obs = env.reset(reset_key)
        hidden = jnp.zeros((env.num_envs, self.ppo.hidden_size), jnp.float32)
        prev_done = jnp.zeros(env.num_envs, bool)

        @jax.jit
        def eval_step(scene, episodes, tables, params, state, obs, hidden,
                      prev_done, key):
            masks = 1.0 - prev_done.astype(jnp.float32)
            amask = obs["action_map"].reshape(env.num_envs, -1)
            action, _, _, hidden = self.policy.apply(
                params, obs, hidden, masks, key,
                self.cfg.deterministic_eval, amask, method=self.policy.act,
            )
            state, obs, _, done, info = env.step_pure(
                scene, episodes, tables, state, action
            )
            return state, obs, hidden, done, info

        totals: dict[str, float] = {}
        count = 0
        max_steps = max_steps or (
            env.cfg.max_episode_steps * (num_episodes // env.num_envs + 2)
        )
        for _ in range(max_steps):
            rng, key = jax.random.split(rng)
            state, obs, hidden, done, info = eval_step(
                env.base.scene, env.base.episodes, env.tables(), params,
                state, obs, hidden, prev_done, key,
            )
            prev_done = done
            d = np.asarray(done)
            if d.any():
                fetched = jax.device_get(info)
                ep_valid = fetched.pop("ep_valid", None)
                for i in np.nonzero(d)[0]:
                    if count >= num_episodes:
                        break
                    if ep_valid is not None and ep_valid[i] == 0.0:
                        # padded duplicate or post-wrap replay (a group that
                        # exhausted its scene's episode list keeps stepping
                        # for lockstep but must not be scored again — the
                        # reference walks each episode exactly once by
                        # pausing exhausted envs, base_trainer.py:184-241)
                        continue
                    count += 1
                    for k, v in fetched.items():
                        totals[k] = totals.get(k, 0.0) + float(v[i])
            if count >= num_episodes:
                break
        return {k: v / max(count, 1) for k, v in totals.items()} | {
            "episode_count": float(count)
        }
