"""CLI: train / eval / benchmark an experiment.

Surface mirrors the reference's run scripts
(ss_baselines/av_nav/run.py:24-101):

    python -m soundspaces_tpu.run --run-type train \
        --exp-config configs/audiogoal_depth.yaml \
        --model-dir data/models/telephone [a.b.c=value ...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import jax


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--run-type", choices=["train", "eval", "benchmark"], default="train"
    )
    parser.add_argument("--exp-config", type=str, default=None)
    parser.add_argument("--model-dir", type=str, default=None)
    parser.add_argument("--eval-checkpoint", type=str, default=None)
    parser.add_argument(
        "--poll", action="store_true",
        help="eval mode: watch the checkpoint folder and evaluate each new "
        "checkpoint (the reference's BaseRLTrainer.eval loop)",
    )
    parser.add_argument("--eval-interval", type=int, default=1)
    parser.add_argument("--prev-ckpt-ind", type=int, default=-1)
    parser.add_argument(
        "--eval-best", action="store_true",
        help="evaluate the checkpoint with the best logged val SPL "
        "(av_wan/run.py:100-127)",
    )
    parser.add_argument("--force-cpu", action="store_true")
    parser.add_argument(
        "opts", nargs=argparse.REMAINDER,
        help="dotted overrides, e.g. ppo.lr=1e-4 trainer.num_envs=64",
    )
    args = parser.parse_args(argv)

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from soundspaces_tpu import trainers  # noqa: F401  (registry side effects)
    from soundspaces_tpu.builder import build_trainer
    from soundspaces_tpu.config import get_config
    from soundspaces_tpu.train.trainer import checkpoint_config, latest_checkpoint

    def apply_model_dir(cfg):
        if args.model_dir:
            cfg = dataclasses.replace(
                cfg,
                model_dir=args.model_dir,
                trainer=dataclasses.replace(
                    cfg.trainer,
                    checkpoint_folder=os.path.join(args.model_dir, "ckpts"),
                ),
            )
        return cfg

    cfg = apply_model_dir(get_config(args.exp_config, args.opts))
    os.makedirs(cfg.model_dir, exist_ok=True)

    if args.run_type == "eval" and not args.poll:
        # eval-config merge precedence (base_trainer.py:124-157): start from
        # the checkpoint's stored experiment config, then re-apply the eval
        # yaml and CLI opts on top
        probe = args.eval_checkpoint or latest_checkpoint(
            cfg.trainer.checkpoint_folder
        )
        stored = checkpoint_config(probe) if probe else None
        if stored:
            from soundspaces_tpu.config import (
                ExperimentConfig,
                get_overrides,
                merge_config,
            )

            cfg = merge_config(ExperimentConfig(), stored)
            for node in get_overrides(args.exp_config, args.opts):
                cfg = merge_config(cfg, node)
            cfg = apply_model_dir(cfg)

    trainer = build_trainer(cfg)
    log_path = os.path.join(cfg.model_dir, "train.log")

    def log_fn(update, metrics):
        line = json.dumps({"update": update, **metrics})
        print(line, flush=True)
        with open(log_path, "a") as f:
            f.write(line + "\n")

    is_savi = cfg.trainer_name == "savi"
    if args.run_type == "train":
        if is_savi:
            trainer.train(
                jax.random.PRNGKey(cfg.trainer.seed),
                num_updates=cfg.trainer.num_updates,
                log_fn=log_fn,
                checkpoint_folder=cfg.trainer.checkpoint_folder,
                checkpoint_interval=cfg.trainer.checkpoint_interval,
                log_interval=cfg.trainer.log_interval,
                resume_from=latest_checkpoint(cfg.trainer.checkpoint_folder),
            )
        else:
            resume = latest_checkpoint(cfg.trainer.checkpoint_folder)
            trainer.train(
                jax.random.PRNGKey(cfg.trainer.seed), log_fn=log_fn,
                resume_from=resume,
            )
    elif args.run_type == "eval":
        if args.poll and is_savi:
            results = trainer.eval(
                checkpoint_folder=cfg.trainer.checkpoint_folder,
                eval_interval=args.eval_interval,
                prev_ckpt_ind=args.prev_ckpt_ind,
                num_episodes=cfg.eval.episode_count,
                log_fn=lambda c, s: print(json.dumps({"checkpoint": c, **s})),
                model_dir=cfg.model_dir,
                seed=cfg.trainer.seed,
            )
            return
        if args.poll:
            results = trainer.eval(
                eval_interval=args.eval_interval,
                prev_ckpt_ind=args.prev_ckpt_ind,
                num_episodes=cfg.eval.episode_count,
                log_fn=lambda c, s: print(json.dumps({"checkpoint": c, **s})),
                model_dir=cfg.model_dir,
            )
            return
        ckpt = args.eval_checkpoint
        if ckpt is None and args.eval_best:
            from soundspaces_tpu.eval.selection import find_best_checkpoint

            ckpt = find_best_checkpoint(cfg.model_dir)
        if ckpt is None:
            ckpt = latest_checkpoint(cfg.trainer.checkpoint_folder)
        if is_savi:
            params, opt_state, bparams, bopt, carry = trainer.init_state(
                jax.random.PRNGKey(cfg.trainer.seed)
            )
            if ckpt:
                params, _, bparams, _ = trainer.load_checkpoint(
                    ckpt, params, opt_state, bparams
                )
            stats = trainer.evaluate(
                params, bparams, num_episodes=cfg.eval.episode_count
            )
        else:
            params, opt_state, carry = trainer.init_state(
                jax.random.PRNGKey(cfg.trainer.seed)
            )
            if ckpt:
                params, _, _ = trainer.load_checkpoint(ckpt, params, opt_state)
            stats = trainer.evaluate(
                params, num_episodes=cfg.eval.episode_count
            )
        print(json.dumps(stats))
        with open(
            os.path.join(cfg.model_dir, f"{cfg.eval.split}_stats.json"), "w"
        ) as f:
            json.dump(stats, f)
    else:  # benchmark: scripted agents (simple_agents equivalent)
        from soundspaces_tpu.eval.benchmark import run_benchmark

        stats = run_benchmark(cfg)
        print(json.dumps(stats))


if __name__ == "__main__":
    main()
