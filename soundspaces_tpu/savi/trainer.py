"""SAVi PPO trainer: SMT policy with external memory + online belief training.

Reference: ss_baselines/savi/ppo/ppo_trainer.py:63-1051 — rollouts thread the
external memory through act (252-340), belief predictions are patched into
observations each step (332-336), and the belief predictor trains online
from rollout spectrograms against ground-truth goal location/category
(train_belief_predictor, 342-404).

Here the whole update is one jitted function: rollout scan (SMT act +
belief predict + env step) -> GAE -> PPO epochs whose evaluate replays the
memory -> belief-predictor gradient step on the rollout batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from soundspaces_tpu.env.audionav import AudioNavEnv
from soundspaces_tpu.savi.belief import BeliefPredictor
from soundspaces_tpu.savi.policy import (
    AudioNavSMTNet,
    SMTPolicy,
    SMTPolicyState,
    smt_initial_state,
)
from soundspaces_tpu.train.ppo import PPOConfig, compute_gae, normalize_advantages


@dataclasses.dataclass(frozen=True)
class SAViConfig:
    memory_size: int = 150  # savi.yaml SMT memory_size
    hidden_size: int = 256
    nhead: int = 8
    use_belief_predictor: bool = True
    belief_lr: float = 1e-4
    online_belief_training: bool = True
    # ablation: zero the belief inputs the policy sees (the predictor still
    # trains/logs) — measures how much the predicted beliefs actually help
    # (VERDICT round-1 item #7)
    ablate_beliefs: bool = False


@struct.dataclass
class SAViCarry:
    env_state: Any
    obs: dict[str, jax.Array]
    policy_state: SMTPolicyState
    prev_done: jax.Array
    location_belief: jax.Array  # [N, 2] smoothed goal-location belief
    prev_pose: jax.Array  # [N, 4] last step's pose obs (odometry smoothing)
    rng: jax.Array


class SAViTrainer:
    def __init__(
        self,
        env: AudioNavEnv,
        ppo_cfg: PPOConfig,
        savi_cfg: SAViConfig = SAViConfig(),
    ):
        self.env = env
        self.ppo = ppo_cfg
        self.savi = savi_cfg
        net = AudioNavSMTNet(
            hidden_size=savi_cfg.hidden_size,
            nhead=savi_cfg.nhead,
            num_actions=env.config.num_actions,
        )
        self.policy = SMTPolicy(net=net, num_actions=env.config.num_actions)
        self.belief = BeliefPredictor(
            num_categories=env.config.num_categories, lr=savi_cfg.belief_lr
        )
        self.optimizer = optax.adam(ppo_cfg.lr, eps=ppo_cfg.eps)
        n_visual = sum(
            1 for m in ("rgb", "depth", "semantic_object") if m in env.config.sensors
        )
        self.feature_dim = 64 * n_visual + 16 + 128 + 4

    # ------------------------------------------------------------------ init
    def init_state(self, rng):
        rng, env_key, p_key, b_key = jax.random.split(rng, 4)
        env_state, obs = self.env.reset(env_key)
        pstate = smt_initial_state(
            self.env.num_envs, self.savi.memory_size, self.feature_dim
        )
        loc_belief = jnp.zeros((self.env.num_envs, 2))
        obs_b = self._with_beliefs(None, obs, loc_belief)
        params = self.policy.init(
            p_key, obs_b, pstate, jnp.ones(self.env.num_envs),
            jax.random.PRNGKey(0), method=self.policy.act,
        )
        bparams, bopt = (None, None)
        if self.savi.use_belief_predictor:
            bparams, bopt = self.belief.init(b_key, obs["spectrogram"])
        opt_state = self.optimizer.init(params)
        carry = SAViCarry(
            env_state=env_state,
            obs=obs,
            policy_state=pstate,
            prev_done=jnp.zeros(self.env.num_envs, bool),
            location_belief=loc_belief,
            prev_pose=obs.get(
                "pose", jnp.zeros((self.env.num_envs, 4))
            ),
            rng=rng,
        )
        return params, opt_state, bparams, bopt, carry

    def _smoothed_location(self, bparams, obs, prev_belief, prev_pose,
                           first_step):
        """Fresh prediction blended with the odometry-transformed previous
        estimate (the reference's temporal smoothing,
        belief_predictor.py:136-202 with weighting_factor 0.5)."""
        raw, _ = self.belief.predict(bparams, obs["spectrogram"])
        if "pose" not in obs:
            return raw
        pose = obs["pose"]
        d_start = pose[..., :2] - prev_pose[..., :2]
        h0 = prev_pose[..., 2]
        c, s = jnp.cos(-h0), jnp.sin(-h0)
        delta = jnp.stack(
            [
                c * d_start[..., 0] - s * d_start[..., 1],
                s * d_start[..., 0] + c * d_start[..., 1],
                pose[..., 2] - h0,
            ],
            axis=-1,
        )
        return self.belief.smooth_location(
            prev_belief, raw, delta, first_step=first_step
        )

    def _with_beliefs(self, bparams, obs, location_belief):
        obs = dict(obs)
        if self.savi.use_belief_predictor and bparams is not None:
            loc, logits = self.belief.predict(bparams, obs["spectrogram"])
            obs["category_belief"] = jax.nn.softmax(logits)
            obs["location_belief"] = location_belief
        else:
            obs["location_belief"] = location_belief
        if self.savi.ablate_beliefs:
            # zeroed-belief ablation: identical shapes, no information
            if "category_belief" in obs:
                obs["category_belief"] = jnp.zeros_like(obs["category_belief"])
            obs["location_belief"] = jnp.zeros_like(obs["location_belief"])
        return obs

    # ------------------------------------------------------------------ train
    def train(
        self,
        rng=None,
        num_updates: int = 1000,
        log_fn=None,
        checkpoint_folder: str | None = None,
        checkpoint_interval: int = 50,
        log_interval: int = 10,
        resume_from: str | None = None,
    ):
        """Host loop over the fused SAVi update (the savi PPOTrainer.train
        surface, savi/ppo/ppo_trainer.py:176-340)."""
        import time as _time

        import numpy as np

        from soundspaces_tpu.train import preemption

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        params, opt_state, bparams, bopt, carry = self.init_state(rng)
        start_update = 0
        if resume_from:
            params, opt_state, bparams, start_update = self.load_checkpoint(
                resume_from, params, opt_state, bparams
            )
        step_fn = jax.jit(self.make_train_step())
        t0 = _time.time()
        steps_per_update = self.ppo.num_steps * self.env.num_envs
        for update in range(start_update, num_updates):
            rng, key = jax.random.split(rng)
            frac = 1.0 - update / max(num_updates, 1)
            clip = self.ppo.clip_param * (
                frac if self.ppo.use_linear_clip_decay else 1.0
            )
            ent = (
                self.ppo.final_entropy_coef
                + (self.ppo.entropy_coef - self.ppo.final_entropy_coef) * frac
                if self.ppo.use_linear_entropy_decay
                else self.ppo.entropy_coef
            )
            params, opt_state, bparams, bopt, carry, metrics = step_fn(
                params, opt_state, bparams, bopt, carry, key,
                jnp.float32(clip), self.env.scene, self.env.episodes,
                ent_coef=jnp.float32(ent),
            )
            if log_fn and ((update + 1) % log_interval == 0
                           or update == num_updates - 1):
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                m["fps"] = steps_per_update * (update + 1 - start_update) / (
                    _time.time() - t0
                )
                log_fn(update, m)
            if checkpoint_folder and (update + 1) % checkpoint_interval == 0:
                self.save_checkpoint(
                    checkpoint_folder, params, opt_state, bparams, update + 1
                )
            if preemption.EXIT_REQUESTED:
                if checkpoint_folder:
                    self.save_checkpoint(
                        checkpoint_folder, params, opt_state, bparams,
                        update + 1,
                    )
                break
        return params, bparams

    def save_checkpoint(self, folder, params, opt_state, bparams, update):
        """ckpt dict includes the belief predictor like the reference's
        {state_dict, belief_predictor} (savi/ppo/ppo_trainer.py:161-175)."""
        import os

        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(folder, f"ckpt.{update}"))
        ocp.PyTreeCheckpointer().save(
            path,
            {"params": params, "opt_state": opt_state,
             "belief_predictor": bparams, "update": update},
            force=True,
        )
        return path

    def load_checkpoint(self, path, params, opt_state, bparams):
        """Restore {params, opt_state, belief_predictor, update} — the SAVi
        checkpoint carries the belief predictor alongside the policy
        (savi/ppo/ppo_trainer.py:161-175)."""
        import os

        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(path),
            item={"params": params, "opt_state": opt_state,
                  "belief_predictor": bparams, "update": 0},
        )
        return (restored["params"], restored["opt_state"],
                restored["belief_predictor"], restored["update"])

    def eval(
        self,
        checkpoint_folder: str,
        eval_interval: int = 1,
        prev_ckpt_ind: int = -1,
        num_episodes: int = 50,
        log_fn=None,
        poll_interval_s: float = 2.0,
        max_wait_s: float = 30.0,
        model_dir: str | None = None,
        seed: int = 0,
    ):
        """Checkpoint-folder polling eval for SAVi (BaseRLTrainer.eval,
        base_trainer.py:68-122, with the SAVi evaluate loop): watch the
        folder, evaluate every `eval_interval`-th new checkpoint (policy +
        belief predictor restored together), log each result."""
        import time as _time

        from soundspaces_tpu.eval.selection import log_eval_result
        from soundspaces_tpu.train.trainer import poll_checkpoint_folder

        results = []
        waited = 0.0
        # template pytrees for orbax restore: only their structure is needed,
        # so build them once rather than re-initializing (and retracing the
        # init jits) for every checkpoint polled
        params0, opt_state0, bparams0, _, _ = self.init_state(
            jax.random.PRNGKey(seed)
        )
        while True:
            ckpt = poll_checkpoint_folder(checkpoint_folder, prev_ckpt_ind)
            if ckpt is None:
                if waited >= max_wait_s:
                    break
                _time.sleep(poll_interval_s)
                waited += poll_interval_s
                continue
            waited = 0.0
            prev_ckpt_ind += 1
            if prev_ckpt_ind % eval_interval != 0:
                continue
            params, _, bparams, update = self.load_checkpoint(
                ckpt, params0, opt_state0, bparams0
            )
            stats = self.evaluate(params, bparams, num_episodes=num_episodes)
            stats["update"] = float(update)
            if model_dir:
                log_eval_result(model_dir, ckpt, stats)
            if log_fn:
                log_fn(ckpt, stats)
            results.append((ckpt, stats))
        return results

    # ------------------------------------------------------------------ eval
    def evaluate(
        self,
        params,
        bparams=None,
        num_episodes: int = 50,
        rng=None,
        max_steps: int | None = None,
        deterministic: bool = False,
    ) -> dict[str, float]:
        """SAVi eval loop: fresh external memory, belief updates per step,
        end-of-episode metric averaging (savi/ppo/ppo_trainer.py:760-1051)."""
        import numpy as np

        env = self.env
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rng, reset_key = jax.random.split(rng)
        env_state, obs = env.reset(reset_key)
        pstate = smt_initial_state(
            env.num_envs, self.savi.memory_size, self.feature_dim
        )
        loc_belief = jnp.zeros((env.num_envs, 2))
        prev_done = jnp.zeros(env.num_envs, bool)
        prev_pose = obs.get("pose", jnp.zeros((env.num_envs, 4)))

        @jax.jit
        def eval_step(scene, episodes, params, bparams, env_state, obs,
                      pstate, loc_belief, prev_pose, prev_done, key):
            not_done = 1.0 - prev_done.astype(jnp.float32)
            if self.savi.use_belief_predictor and bparams is not None:
                loc_belief = self._smoothed_location(
                    bparams, obs, loc_belief, prev_pose, prev_done
                )
            obs_b = self._with_beliefs(bparams, obs, loc_belief)
            action, _, _, pstate = self.policy.apply(
                params, obs_b, pstate, not_done, key, deterministic,
                method=self.policy.act,
            )
            pose_now = obs.get("pose", prev_pose)
            env_state, obs, _, done, info = env.step_pure(
                scene, episodes, env_state, action
            )
            return env_state, obs, pstate, loc_belief, pose_now, done, info

        totals: dict[str, float] = {}
        count = 0
        max_steps = max_steps or (
            env.config.max_episode_steps * (num_episodes // env.num_envs + 2)
        )
        for _ in range(max_steps):
            rng, key = jax.random.split(rng)
            env_state, obs, pstate, loc_belief, prev_pose, done, info = (
                eval_step(
                    env.scene, env.episodes, params, bparams, env_state, obs,
                    pstate, loc_belief, prev_pose, prev_done, key,
                )
            )
            prev_done = done
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

    # ----------------------------------------------------------- train step
    def make_train_step(self, axis_name: str | None = None):
        ppo_cfg, savi = self.ppo, self.savi

        def rollout(params, bparams, carry: SAViCarry, scene, episodes):
            init_pstate = carry.policy_state

            def one_step(c: SAViCarry, _):
                rng, key = jax.random.split(c.rng)
                not_done = 1.0 - c.prev_done.astype(jnp.float32)
                # location belief with odometry-transformed temporal
                # smoothing (belief_predictor.py:136-202; episode starts
                # take the fresh prediction)
                if savi.use_belief_predictor and bparams is not None:
                    fresh_loc = self._smoothed_location(
                        bparams, c.obs, c.location_belief, c.prev_pose,
                        c.prev_done,
                    )
                else:
                    fresh_loc = c.location_belief
                obs_b = self._with_beliefs(bparams, c.obs, fresh_loc)
                action, logp, value, pstate = self.policy.apply(
                    params, obs_b, c.policy_state, not_done, key,
                    method=self.policy.act,
                )
                env_state, obs, reward, done, info = self.env.step_pure(
                    scene, episodes, c.env_state, action
                )
                out = dict(
                    obs=c.obs,
                    beliefs=fresh_loc,
                    actions=action,
                    log_probs=logp,
                    values=value,
                    rewards=reward,
                    dones=done,
                    prev_dones=c.prev_done,
                    infos=info,
                )
                pose_now = c.obs.get("pose", c.prev_pose)
                return (
                    SAViCarry(env_state, obs, pstate, done, fresh_loc,
                              pose_now, rng),
                    out,
                )

            carry2, traj = jax.lax.scan(
                one_step, carry, None, length=ppo_cfg.num_steps
            )
            # bootstrap value
            not_done = 1.0 - carry2.prev_done.astype(jnp.float32)
            obs_b = self._with_beliefs(bparams, carry2.obs, carry2.location_belief)
            _, _, last_value, _ = self.policy.apply(
                params, obs_b, carry2.policy_state, not_done,
                jax.random.PRNGKey(0), True, method=self.policy.act,
            )
            return carry2, traj, init_pstate, last_value

        def eval_apply(params, obs_b, init_pstate, prev_dones, actions):
            return self.policy.apply(
                params, obs_b, init_pstate, prev_dones, actions,
                method=self.policy.evaluate_actions,
            )

        # NOTE: evaluate_actions remats its replay PER STEP internally
        # (savi/policy.py) — wrapping the whole eval in jax.checkpoint here
        # would not cap the peak (the rematerialized forward still stacks
        # all T steps' attention residuals at once) and only adds FLOPs.

        def loss_fn(params, bparams, traj, init_pstate, adv, returns, clip,
                    ent_coef):
            obs_b = jax.vmap(
                lambda o, l: self._with_beliefs(bparams, o, l)
            )(traj["obs"], traj["beliefs"])
            logp, entropy, values = eval_apply(
                params, obs_b, init_pstate, traj["prev_dones"], traj["actions"]
            )
            ratio = jnp.exp(logp - traj["log_probs"])
            surr1 = ratio * adv
            surr2 = jnp.clip(ratio, 1 - clip, 1 + clip) * adv
            action_loss = -jnp.minimum(surr1, surr2).mean()
            v_clip = traj["values"] + jnp.clip(
                values - traj["values"], -clip, clip
            )
            value_loss = 0.5 * jnp.maximum(
                (values - returns) ** 2, (v_clip - returns) ** 2
            ).mean()
            ent = entropy.mean()
            total = (
                action_loss
                + ppo_cfg.value_loss_coef * value_loss
                - ent_coef * ent
            )
            return total, {
                "action_loss": action_loss,
                "value_loss": value_loss,
                "entropy": ent,
            }

        def step(params, opt_state, bparams, bopt, carry, rng, clip,
                 scene, episodes, ent_coef=None):
            # traced-scalar entropy coefficient for linear annealing (the
            # schedule that rescued AV-WaN/continuous from the quick-STOP
            # optimum on the realistic world — VERDICT r3 weak #7); None
            # falls back to the static config value
            if ent_coef is None:
                ent_coef = jnp.float32(ppo_cfg.entropy_coef)
            carry, traj, init_pstate, last_value = rollout(
                params, bparams, carry, scene, episodes
            )
            adv, returns = compute_gae(
                traj["rewards"], traj["values"], traj["dones"], last_value,
                ppo_cfg.gamma, ppo_cfg.tau,
            )
            adv = normalize_advantages(adv, axis_name)

            grad_fn = jax.grad(loss_fn, has_aux=True)

            def epoch(carry_in, key):
                params, opt_state = carry_in
                grads, metrics = grad_fn(
                    params, bparams, traj, init_pstate, adv, returns, clip,
                    ent_coef,
                )
                if axis_name is not None:
                    grads = jax.lax.pmean(grads, axis_name)
                gnorm = optax.global_norm(grads)
                scale = jnp.minimum(1.0, ppo_cfg.max_grad_norm / (gnorm + 1e-6))
                grads = jax.tree.map(lambda g: g * scale, grads)
                updates, opt_state = self.optimizer.update(
                    grads, opt_state, params
                )
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            keys = jax.random.split(rng, ppo_cfg.ppo_epoch)
            (params, opt_state), metrics = jax.lax.scan(
                epoch, (params, opt_state), keys
            )
            metrics = jax.tree.map(jnp.mean, metrics)

            # online belief-predictor training against ground truth
            if savi.use_belief_predictor and savi.online_belief_training:
                spec = traj["obs"]["spectrogram"].reshape(
                    (-1,) + traj["obs"]["spectrogram"].shape[2:]
                )
                gt_loc = traj["obs"]["pointgoal_with_gps_compass"]
                gt_xy = jnp.stack(
                    [
                        gt_loc[..., 0] * jnp.cos(gt_loc[..., 1]),
                        gt_loc[..., 0] * jnp.sin(gt_loc[..., 1]),
                    ],
                    axis=-1,
                ).reshape(-1, 2)
                gt_cat = jnp.argmax(traj["obs"]["category"], -1).reshape(-1)
                audible = (
                    jnp.abs(spec).sum(axis=(1, 2, 3)) > 1e-6
                )
                bparams, bopt, baux = self.belief.update(
                    bparams, bopt, spec, gt_xy, gt_cat, audible,
                    axis_name=axis_name,
                )
                metrics.update(baux)

            done_f = traj["dones"].astype(jnp.float32)
            n_done = jnp.maximum(done_f.sum(), 1.0)
            metrics.update(
                {
                    "reward": traj["rewards"].sum(0).mean(),
                    "episodes": done_f.sum(),
                    **{
                        k: (v * done_f).sum() / n_done
                        for k, v in traj["infos"].items()
                    },
                }
            )
            return params, opt_state, bparams, bopt, carry, metrics

        return step
