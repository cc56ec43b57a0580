"""PPO trainer: the train()/eval() surface of the reference's
BaseRLTrainer/PPOTrainer (ss_baselines/common/base_trainer.py:21-241,
av_nav/ppo/ppo_trainer.py:44-693), rebuilt around a single jitted train step.

Structure per update:
    [jit] rollout scan (T steps, N envs, on device)
        -> GAE -> ppo_epoch x minibatch updates -> new params
Host work is only: schedule bookkeeping, metric fetch (scalars), logging,
checkpointing (orbax), and eval-time aggregation.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from soundspaces_tpu.env.audionav import AudioNavEnv
from soundspaces_tpu.models.policy import AudioNavBaselineNet, CategoricalPolicy
from soundspaces_tpu.train.ppo import PPOConfig, ppo_update
from soundspaces_tpu.train.rollout import RolloutCarry, collect_rollout


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """Experiment-level knobs (reference _C node, av_nav/config/default.py)."""

    num_updates: int = 10000
    num_envs: int = 16
    log_interval: int = 10
    checkpoint_interval: int = 50
    checkpoint_folder: str = "data/checkpoints"
    seed: int = 0
    deterministic_eval: bool = False
    test_episode_count: int = 100
    use_visual: bool = True
    use_audio: bool = True
    use_pointgoal: bool = False
    # DD-PPO policy family (savi/ddppo/policy): "simple" 3-conv CNN, or a
    # GroupNorm "resnet18"/"resnet50"/"se_resnext50" backbone
    visual_encoder: str = "simple"
    # running mean/var input normalization for rgb/depth (the reference's
    # RunningMeanAndVar, updated during rollouts, frozen at eval)
    normalize_visual_inputs: bool = False


class PPOTrainer:
    def __init__(
        self,
        trainer_cfg: TrainerConfig,
        ppo_cfg: PPOConfig,
        env: AudioNavEnv,
        eval_env: AudioNavEnv | None = None,
        mesh=None,
    ):
        self.cfg = trainer_cfg
        self.ppo = ppo_cfg
        self.env = env
        self.eval_env = eval_env
        self.mesh = mesh

        net = AudioNavBaselineNet(
            hidden_size=ppo_cfg.hidden_size,
            use_visual=trainer_cfg.use_visual,
            use_audio=trainer_cfg.use_audio,
            use_pointgoal=trainer_cfg.use_pointgoal,
            visual_encoder=trainer_cfg.visual_encoder,
        )
        self.policy = CategoricalPolicy(net=net, num_actions=env.config.num_actions)

        from soundspaces_tpu.train.ppo import make_lr_schedule

        self.optimizer = optax.adam(
            make_lr_schedule(ppo_cfg, trainer_cfg.num_updates), eps=ppo_cfg.eps
        )

        self._train_step = None  # built lazily (needs params structure)

    def _bank_args(self) -> tuple:
        """Static device banks appended to every train-step call (subclasses
        with extra lookup tables override)."""
        return (self.env.scene, self.env.episodes)

    # ------------------------------------------------------------------ setup
    def init_state(self, rng: jax.Array):
        """Returns (params, opt_state, carry): initialized model + env reset."""
        rng, env_key, param_key = jax.random.split(rng, 3)
        env_state, obs = self.env.reset(env_key)
        hidden = jnp.zeros((self.env.num_envs, self.ppo.hidden_size), jnp.float32)
        norm_stats = None
        init_obs = obs
        if self.cfg.normalize_visual_inputs:
            from soundspaces_tpu.models.resnet import (
                NormStats,
                normalize_visual_obs,
                normalized_visual_channels,
            )

            norm_stats = NormStats.zeros(normalized_visual_channels(obs))
            _, init_obs = normalize_visual_obs(norm_stats, obs)
        params = self.policy.init(
            param_key, init_obs, hidden, jnp.ones(self.env.num_envs)
        )
        opt_state = self.optimizer.init(params)
        carry = RolloutCarry(
            env_state=env_state,
            obs=obs,
            hidden=hidden,
            prev_done=jnp.zeros(self.env.num_envs, bool),
            rng=rng,
            norm_stats=norm_stats,
        )
        return params, opt_state, carry

    # ------------------------------------------------------------- train step
    def _policy_act(self, params, obs, hidden, masks, rng, deterministic=False):
        return self.policy.apply(
            params, obs, hidden, masks, rng, deterministic,
            method=self.policy.act,
        )

    def _policy_evaluate(self, params, obs, hidden, masks, actions):
        return self.policy.apply(
            params, obs, hidden, masks, actions,
            method=self.policy.evaluate_actions,
        )

    def make_train_step(self, axis_name: str | None = None) -> Callable:
        """One full PPO update as a pure function
        (params, opt_state, carry, rng, clip_param, ent_coef, scene,
        episodes) ->
        (params, opt_state, carry, metrics). The banks are explicit args —
        never jit constants (see env/audionav.py design note)."""

        def step(params, opt_state, carry, rng, clip_param, ent_coef, scene,
                 episodes):
            carry, rollout = collect_rollout(
                self._policy_act, params, self.env, scene, episodes, carry,
                self.ppo.num_steps, norm_axis=axis_name,
            )
            params, opt_state, losses = ppo_update(
                params,
                opt_state,
                self.optimizer,
                self._policy_evaluate,
                rollout,
                rng,
                self.ppo,
                clip_param,
                axis_name=axis_name,
                entropy_coef=ent_coef,
            )
            done_f = rollout.dones.astype(jnp.float32)
            n_done = jnp.maximum(done_f.sum(), 1.0)
            metrics = {
                "reward": rollout.rewards.sum(0).mean(),
                "episodes": done_f.sum(),
                **{
                    k: (v * done_f).sum() / n_done
                    for k, v in rollout.infos.items()
                },
                **losses,
            }
            if axis_name is not None:
                metrics = jax.lax.pmean(metrics, axis_name)
            return params, opt_state, carry, metrics

        return step

    def make_phase_steps(self):
        """Rollout and update as SEPARATE jitted programs, so wall-clock
        splits into the reference's env_time/pth_time ledger
        (av_nav/ppo/ppo_trainer.py:126-155). Slightly slower than the fused
        step (extra dispatch + rollout materialization) — profiling only."""

        def rollout_fn(params, carry, scene, episodes):
            return collect_rollout(
                self._policy_act, params, self.env, scene, episodes, carry,
                self.ppo.num_steps,
            )

        def update_fn(params, opt_state, rollout, rng, clip, ent):
            params, opt_state, losses = ppo_update(
                params, opt_state, self.optimizer, self._policy_evaluate,
                rollout, rng, self.ppo, clip, entropy_coef=ent,
            )
            done_f = rollout.dones.astype(jnp.float32)
            n_done = jnp.maximum(done_f.sum(), 1.0)
            metrics = {
                "reward": rollout.rewards.sum(0).mean(),
                "episodes": done_f.sum(),
                **{k: (v * done_f).sum() / n_done
                   for k, v in rollout.infos.items()},
                **losses,
            }
            return params, opt_state, metrics

        return jax.jit(rollout_fn), jax.jit(update_fn)

    # ------------------------------------------------------------------ train
    def train(
        self,
        rng: jax.Array | None = None,
        num_updates: int | None = None,
        log_fn: Callable[[int, dict], None] | None = None,
        resume_from: str | None = None,
        profile: bool = False,
    ):
        cfg, ppo = self.cfg, self.ppo
        num_updates = num_updates or cfg.num_updates
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        params, opt_state, carry = self.init_state(rng)
        start_update = 0
        if resume_from:
            if getattr(carry, "norm_stats", None) is not None:
                params, opt_state, start_update, stats = self.load_checkpoint(
                    resume_from, params, opt_state, carry.norm_stats
                )
                carry = carry.replace(norm_stats=stats)
            else:
                params, opt_state, start_update = self.load_checkpoint(
                    resume_from, params, opt_state
                )
        if self.mesh is not None:
            from soundspaces_tpu.train.parallel import (
                replicate,
                shard_batch_env_axis,
            )

            params = replicate(self.mesh, params)
            opt_state = replicate(self.mesh, opt_state)
            carry = shard_batch_env_axis(self.mesh, carry, self.env.num_envs)

        from soundspaces_tpu.train import preemption

        if self.mesh is not None:
            from soundspaces_tpu.train.parallel import (
                DP_AXIS,
                data_parallel_step,
                replicate,
                shard_batch_env_axis,
            )

            step_fn = jax.jit(
                data_parallel_step(
                    self.mesh,
                    self.make_train_step(axis_name=DP_AXIS),
                    self.env.num_envs,
                )
            )
        else:
            step_fn = jax.jit(self.make_train_step())
        timers = None
        if profile:
            from soundspaces_tpu.utils.profiling import PhaseTimers

            assert self.mesh is None, "profile mode is single-program"
            rollout_fn, update_fn = self.make_phase_steps()
            timers = PhaseTimers()
        window: list[float] = []
        t0 = time.time()
        steps_per_update = ppo.num_steps * self.env.num_envs
        for update in range(start_update, num_updates):
            rng, key = jax.random.split(rng)
            frac = 1.0 - update / cfg.num_updates
            clip = ppo.clip_param * (frac if ppo.use_linear_clip_decay else 1.0)
            ent = (
                ppo.final_entropy_coef
                + (ppo.entropy_coef - ppo.final_entropy_coef) * frac
                if ppo.use_linear_entropy_decay
                else ppo.entropy_coef
            )
            if profile:
                # env_time ~= rollout phase (sim + act fused on device);
                # pth_time ~= PPO update phase
                with timers.phase("env_time"):
                    carry, rollout = jax.block_until_ready(
                        rollout_fn(params, carry, *self._bank_args())
                    )
                with timers.phase("pth_time"):
                    params, opt_state, metrics = jax.block_until_ready(
                        update_fn(params, opt_state, rollout, key,
                                  jnp.float32(clip), jnp.float32(ent))
                    )
            else:
                params, opt_state, carry, metrics = step_fn(
                    params, opt_state, carry, key, jnp.float32(clip),
                    jnp.float32(ent), *self._bank_args(),
                )
            if (update + 1) % cfg.log_interval == 0 or update == num_updates - 1:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                if timers is not None:
                    m.update(timers.summary())
                window.append(m["reward"])
                window = window[-ppo.reward_window_size :]
                m["reward_window"] = float(np.mean(window))
                if ppo.use_linear_entropy_decay:
                    m["entropy_coef"] = float(ent)
                m["fps"] = steps_per_update * (update + 1 - start_update) / (
                    time.time() - t0
                )
                if log_fn:
                    log_fn(update, m)
            if (update + 1) % cfg.checkpoint_interval == 0:
                self.save_checkpoint(
                    params, opt_state, update + 1,
                    norm_stats=getattr(carry, "norm_stats", None),
                )
            if preemption.EXIT_REQUESTED:
                # snapshot at the update boundary and optionally requeue
                # (the reference's SIGUSR1 flow, ddppo_trainer.py:250-272)
                path = self.save_checkpoint(
                    params, opt_state, update + 1,
                    norm_stats=getattr(carry, "norm_stats", None),
                )
                if preemption.REQUEUE_REQUESTED:
                    preemption.requeue_job()
                break
        return params, opt_state, carry

    # -------------------------------------------------------------- eval loop
    def eval(
        self,
        eval_interval: int = 1,
        prev_ckpt_ind: int = -1,
        use_last_ckpt: bool = False,
        num_episodes: int | None = None,
        log_fn: Callable[[str, dict], None] | None = None,
        poll_interval_s: float = 2.0,
        max_wait_s: float = 30.0,
        model_dir: str | None = None,
    ) -> list[tuple[str, dict]]:
        """Checkpoint-folder polling eval (BaseRLTrainer.eval,
        ss_baselines/common/base_trainer.py:68-122): watch the checkpoint
        folder, evaluate every `eval_interval`-th new checkpoint, log each
        result. Unlike the reference's infinite 2 s poll, gives up after
        `max_wait_s` without a new checkpoint so jobs terminate."""
        from soundspaces_tpu.eval.selection import log_eval_result

        results: list[tuple[str, dict]] = []
        if use_last_ckpt:
            last = latest_checkpoint(self.cfg.checkpoint_folder)
            queue = [last] if last else []
        else:
            queue = None  # poll mode
        waited = 0.0
        while True:
            if queue is not None:
                if not queue:
                    break
                ckpt = queue.pop(0)
            else:
                ckpt = poll_checkpoint_folder(
                    self.cfg.checkpoint_folder, prev_ckpt_ind
                )
                if ckpt is None:
                    if waited >= max_wait_s:
                        break
                    time.sleep(poll_interval_s)
                    waited += poll_interval_s
                    continue
                waited = 0.0
                prev_ckpt_ind += 1
                if prev_ckpt_ind % eval_interval != 0:
                    continue
            params, opt_state, carry0 = self.init_state(
                jax.random.PRNGKey(self.cfg.seed)
            )
            # getattr: carry classes without input normalization (e.g. the
            # AV-WaN WanCarry) have no norm_stats field at all
            norm_stats = None
            if getattr(carry0, "norm_stats", None) is not None:
                params, _, update, norm_stats = self.load_checkpoint(
                    ckpt, params, opt_state, carry0.norm_stats
                )
            else:
                params, _, update = self.load_checkpoint(ckpt, params, opt_state)
            kwargs = {"norm_stats": norm_stats} if norm_stats is not None else {}
            stats = self.evaluate(params, num_episodes=num_episodes, **kwargs)
            stats["update"] = float(update)
            if model_dir:
                log_eval_result(model_dir, ckpt, stats)
            if log_fn:
                log_fn(ckpt, stats)
            results.append((ckpt, stats))
        return results

    # ------------------------------------------------------------------- eval
    def evaluate(
        self,
        params,
        num_episodes: int | None = None,
        rng: jax.Array | None = None,
        max_steps: int | None = None,
        video_dir: str | None = None,
        norm_stats=None,
    ) -> dict[str, float]:
        """Run `num_episodes` episodes on the eval env (sequential episode
        iteration) and average the end-of-episode measures — the
        _eval_checkpoint loop (av_nav/ppo/ppo_trainer.py:399-693) without
        process pausing: finished envs simply keep cycling and we stop
        counting after the target episode count."""
        env = self.eval_env or self.env
        num_episodes = num_episodes or self.cfg.test_episode_count
        requested_episodes = num_episodes
        ep_valid_mask = getattr(env.episodes, "valid", None)
        if env.config.episode_sampling == "sequential":
            # each bank episode is scored at most once (ep_valid first-pass
            # gate); multi-scene stacking additionally pads smaller scenes
            # by cycling, so only the true (non-duplicate) episodes count
            quota = (
                int(np.asarray(ep_valid_mask).sum())
                if ep_valid_mask is not None
                else int(env.episodes.num_episodes)
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
        def eval_step(scene, episodes, params, state, obs, hidden, prev_done, key):
            masks = 1.0 - prev_done.astype(jnp.float32)
            if norm_stats is not None:
                # eval uses the FROZEN running statistics (the reference's
                # eval-mode RunningMeanAndVar forward)
                from soundspaces_tpu.models.resnet import normalize_visual_obs

                _, obs = normalize_visual_obs(norm_stats, obs, update=False)
            action, _, _, hidden = self._policy_act(
                params, obs, hidden, masks, key,
                deterministic=self.cfg.deterministic_eval,
            )
            state, obs, _, done, info = env.step_pure(
                scene, episodes, state, action
            )
            return state, obs, hidden, done, info

        totals: dict[str, float] = {}
        count = 0
        video_frames: list = []
        video_audio: list = []
        videos_written = 0
        played_episodes = num_episodes
        if ep_valid_mask is not None:
            # padded duplicates are played but not scored — budget steps for
            # the full padded episode stream
            m = np.asarray(ep_valid_mask)
            played_episodes = int(
                np.ceil(num_episodes * m.size / max(m.sum(), 1))
            )
        max_steps = max_steps or (
            env.config.max_episode_steps
            * (played_episodes // env.num_envs + 2)
        )
        for _ in range(max_steps):
            rng, key = jax.random.split(rng)
            state, obs, hidden, done, info = eval_step(
                env.scene, env.episodes, params, state, obs, hidden, prev_done, key
            )
            prev_done = done
            if video_dir is not None and "audiogoal" in obs:
                # record env 0 (generate_video role, common/utils.py:279-318)
                from soundspaces_tpu.utils.video import (
                    images_to_video_with_audio,
                    observations_to_image,
                    top_down_map_from_state,
                )

                single = {k: np.asarray(v[0]) for k, v in obs.items()}
                frame = observations_to_image(single)
                # TOP_DOWN_MAP panel (ppo_trainer.py:446-453, 628-635)
                tdm = top_down_map_from_state(env.scene, state, 0)
                h = max(frame.shape[0], tdm.shape[0])
                frame = np.pad(frame, ((0, h - frame.shape[0]), (0, 0), (0, 0)))
                tdm = np.pad(tdm, ((0, h - tdm.shape[0]), (0, 0), (0, 0)))
                video_frames.append(np.concatenate([frame, tdm], axis=1))
                video_audio.append(np.asarray(obs["audiogoal"][0]))
                if bool(np.asarray(done)[0]) and video_frames:
                    images_to_video_with_audio(
                        video_frames, video_audio, video_dir,
                        f"episode_{videos_written}", env.scene.sampling_rate,
                        fps=1,
                    )
                    videos_written += 1
                    video_frames, video_audio = [], []
            d = np.asarray(done)
            if d.any():
                fetched = jax.device_get(info)
                ep_valid = fetched.pop("ep_valid", None)
                for i in np.nonzero(d)[0]:
                    if count >= num_episodes:
                        break
                    if ep_valid is not None and ep_valid[i] == 0.0:
                        # padded duplicate slot from multi-scene episode
                        # stacking — played for lockstep, never scored
                        continue
                    count += 1
                    for k, v in fetched.items():
                        totals[k] = totals.get(k, 0.0) + float(v[i])
            if count >= num_episodes:
                break
        out = {k: v / max(count, 1) for k, v in totals.items()} | {
            "episode_count": float(count)
        }
        if requested_episodes != num_episodes:
            out["requested_episodes"] = float(requested_episodes)
        return out

    # ------------------------------------------------------------ checkpoints
    # set by the builder so checkpoints carry the full experiment config,
    # like the reference's ckpt dicts carry theirs (ppo_trainer.py:91-106)
    experiment_config = None

    def save_checkpoint(self, params, opt_state, update: int, norm_stats=None):
        """ckpt.{i} with model + optimizer + step (+ running input-normalizer
        state when in use, + experiment config as JSON when known), like the
        reference's ckpt.{i}.pth dicts."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(
            os.path.join(self.cfg.checkpoint_folder, f"ckpt.{update}")
        )
        payload = {"params": params, "opt_state": opt_state, "update": update}
        if norm_stats is not None:
            payload["norm_stats"] = norm_stats
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(path, payload, force=True)
        if self.experiment_config is not None:
            with open(os.path.join(path, "experiment_config.json"), "w") as f:
                json.dump(dataclasses.asdict(self.experiment_config), f)
        return path

    def load_checkpoint(self, path: str, params, opt_state, norm_stats=None):
        import orbax.checkpoint as ocp

        item = {"params": params, "opt_state": opt_state, "update": 0}
        if norm_stats is not None:
            item["norm_stats"] = norm_stats
        ckpt = ocp.PyTreeCheckpointer()
        restored = ckpt.restore(os.path.abspath(path), item=item)
        if norm_stats is not None:
            return (restored["params"], restored["opt_state"],
                    restored["update"], restored["norm_stats"])
        return restored["params"], restored["opt_state"], restored["update"]


def latest_checkpoint(folder: str) -> str | None:
    """Newest ckpt.{i} in a folder."""
    cands = _list_checkpoints(folder)
    return cands[-1] if cands else None


def checkpoint_config(path: str) -> dict | None:
    """The experiment config stored alongside a checkpoint, if any — the
    ckpt['config'] the reference merges at eval time
    (base_trainer.py:124-157)."""
    p = os.path.join(path, "experiment_config.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _list_checkpoints(folder: str) -> list[str]:
    import re

    if not os.path.isdir(folder):
        return []
    # strictly ckpt.<int> — orbax writes 'ckpt.N.orbax-checkpoint-tmp-*'
    # in-progress dirs that must never be picked up by a concurrent
    # polling eval (they vanish on rename)
    cands = [f for f in os.listdir(folder) if re.fullmatch(r"ckpt\.\d+", f)]
    cands.sort(key=lambda f: int(f.split(".")[1]))
    return [os.path.join(folder, f) for f in cands]


def poll_checkpoint_folder(folder: str, previous_index: int) -> str | None:
    """The (previous_index+1)-th checkpoint in training order, or None if it
    hasn't appeared yet (ss_baselines/common/utils.py:156-181; ordering by
    update index rather than mtime — orbax writes are multi-file)."""
    cands = _list_checkpoints(folder)
    ind = previous_index + 1
    return cands[ind] if ind < len(cands) else None
