"""One-process train + held-out-eval job for the serial TPU chip queue.

Training and the checkpoint-sweep eval share ONE process so the scene's
device banks upload over the axon tunnel once per model family instead of
once per phase (~GBs at realistic scale, REALISTIC.md "Scale facts"). The
flow mirrors run.py's two run-types back to back:

  1. train with auto-resume from the model dir's latest checkpoint (the
     queue's wedge-recovery path: if the watchdog kills a stalled run,
     relaunching continues from the last ckpt.* snapshot)
  2. sweep the checkpoint folder with the polling eval loop
     (BaseRLTrainer.eval, base_trainer.py:68-122), scoring every
     `--eval-interval`-th checkpoint on the eval split, PLUS always the
     final checkpoint

Artifacts land in --model-dir: train.log (one JSON line per logged update)
and val.log (one JSON line per evaluated checkpoint).

Usage:
    python -m soundspaces_tpu.tools.train_eval_job \
        --exp-config configs/realistic_semantic.yaml \
        --model-dir /tmp/models/savi_r4 --eval-interval 4 [a.b=v ...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import jax


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp-config", required=True)
    p.add_argument("--model-dir", required=True)
    p.add_argument("--eval-interval", type=int, default=1)
    p.add_argument("--eval-episodes", type=int, default=None)
    p.add_argument("--skip-train", action="store_true")
    p.add_argument(
        "--eval-latest-only", action="store_true",
        help="score only the latest checkpoint (e.g. the test-split "
        "golden-number protocol, INSTALLATION.md:44-48)",
    )
    p.add_argument(
        "--eval-best-from", default=None, metavar="VAL_LOG",
        help="score only the checkpoint with the best --eval-best-metric "
        "in the given model-dir val log (the reference golden protocol "
        "tests the BEST val checkpoint, not the last one — "
        "av_nav/README.md:25-27). Falls back to the latest checkpoint "
        "when the log is missing/empty.",
    )
    p.add_argument("--eval-best-metric", default="spl")
    p.add_argument("--val-log", default="val.log")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args(argv)

    from soundspaces_tpu import trainers  # noqa: F401 (registry)
    from soundspaces_tpu.builder import build_trainer
    from soundspaces_tpu.config import get_config
    from soundspaces_tpu.train.trainer import latest_checkpoint

    cfg = get_config(args.exp_config, args.opts)
    cfg = dataclasses.replace(
        cfg,
        model_dir=args.model_dir,
        trainer=dataclasses.replace(
            cfg.trainer,
            checkpoint_folder=os.path.join(args.model_dir, "ckpts"),
        ),
    )
    os.makedirs(cfg.model_dir, exist_ok=True)

    # Setup-phase heartbeat until the first real log line (see
    # utils/jobs.py for why)
    from soundspaces_tpu.utils.jobs import start_setup_heartbeat

    hb_stop = start_setup_heartbeat("job")

    trainer = build_trainer(cfg)
    is_savi = cfg.trainer_name == "savi"
    num_eval = args.eval_episodes or cfg.eval.episode_count

    def file_log(name):
        path = os.path.join(cfg.model_dir, name)

        def log_fn(key, metrics):
            hb_stop.set()
            head = "update" if isinstance(key, int) else "checkpoint"
            line = json.dumps({head: key, **metrics})
            print(line, flush=True)
            with open(path, "a") as f:
                f.write(line + "\n")

        return log_fn

    if not args.skip_train:
        resume = latest_checkpoint(cfg.trainer.checkpoint_folder)
        if resume:
            print(f"[job] resuming from {resume}", flush=True)
        if is_savi:
            trainer.train(
                jax.random.PRNGKey(cfg.trainer.seed),
                num_updates=cfg.trainer.num_updates,
                log_fn=file_log("train.log"),
                checkpoint_folder=cfg.trainer.checkpoint_folder,
                checkpoint_interval=cfg.trainer.checkpoint_interval,
                log_interval=cfg.trainer.log_interval,
                resume_from=resume,
            )
        else:
            trainer.train(
                jax.random.PRNGKey(cfg.trainer.seed),
                log_fn=file_log("train.log"),
                resume_from=resume,
            )
        print("[job] training done", flush=True)

    val_log = file_log(args.val_log)
    folder = cfg.trainer.checkpoint_folder
    last = latest_checkpoint(folder)
    if args.eval_best_from:
        best_name, best_val = None, -float("inf")
        src = os.path.join(cfg.model_dir, args.eval_best_from)
        if os.path.exists(src):
            with open(src) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    v = rec.get(args.eval_best_metric)
                    # a record with the metric but no checkpoint name must
                    # not raise the bar (it would block lower-scoring real
                    # entries), and the named file must still exist on disk
                    # (r3: checkpoints died with the VM while val.log lived
                    # on in results/)
                    name = rec.get("checkpoint")
                    if (
                        v is not None
                        and v > best_val
                        and name
                        and os.path.exists(os.path.join(folder, name))
                    ):
                        best_name, best_val = name, v
        if best_name:
            print(
                f"[job] best-val checkpoint by {args.eval_best_metric}: "
                f"{best_name} ({best_val:.3f})",
                flush=True,
            )
            ckpts = [os.path.join(folder, best_name)]
        else:
            print(
                f"[job] no usable {args.eval_best_from}; "
                "falling back to latest",
                flush=True,
            )
            ckpts = [last] if last else []
    elif args.eval_latest_only:
        ckpts = [last] if last else []
    else:
        from soundspaces_tpu.train.trainer import _list_checkpoints

        all_ckpts = _list_checkpoints(folder)
        ckpts = all_ckpts[:: max(args.eval_interval, 1)]
        if all_ckpts and all_ckpts[-1] not in ckpts:
            ckpts.append(all_ckpts[-1])  # the final ckpt is always scored
    # Resume-aware sweep: a killed/wedged job relaunches with training
    # already complete, so don't re-score checkpoints the val log already
    # holds (the axon tunnel occasionally wedges mid-sweep and the queue
    # watchdog kills for resume — results/R3_QUEUE.md).
    val_path = os.path.join(cfg.model_dir, args.val_log)
    scored = set()
    if not args.eval_latest_only and os.path.exists(val_path):
        # (applies to --eval-best-from too: a relaunch after a wedge must
        # not burn another 1000-episode sweep on an already-scored ckpt)
        with open(val_path) as f:
            for line in f:
                try:
                    scored.add(json.loads(line).get("checkpoint"))
                except json.JSONDecodeError:
                    pass
    for ckpt in ckpts:
        if os.path.basename(ckpt) in scored:
            print(f"[job] already scored {ckpt}; skipping", flush=True)
            continue
        if is_savi:
            params, opt_state, bparams, bopt, carry = trainer.init_state(
                jax.random.PRNGKey(cfg.trainer.seed)
            )
            params, _, bparams, update = trainer.load_checkpoint(
                ckpt, params, opt_state, bparams
            )
            stats = trainer.evaluate(params, bparams, num_episodes=num_eval)
        else:
            params, opt_state, carry0 = trainer.init_state(
                jax.random.PRNGKey(cfg.trainer.seed)
            )
            norm_stats = None
            if getattr(carry0, "norm_stats", None) is not None:
                params, _, update, norm_stats = trainer.load_checkpoint(
                    ckpt, params, opt_state, carry0.norm_stats
                )
            else:
                params, _, update = trainer.load_checkpoint(
                    ckpt, params, opt_state
                )
            kw = {"norm_stats": norm_stats} if norm_stats is not None else {}
            stats = trainer.evaluate(params, num_episodes=num_eval, **kw)
        stats["update"] = float(update)
        val_log(os.path.basename(ckpt), stats)
    print("[job] eval sweep done", flush=True)


if __name__ == "__main__":
    main()
