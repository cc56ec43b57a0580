"""Round-4 serial TPU chip work queue.

Drives the single exclusive-access chip through the round's training/eval
jobs in VERDICT priority order, one subprocess at a time, with a
stale-log watchdog (the axon tunnel occasionally wedges a process: zero
CPU, frozen log — round-3 queue notes, results/R3_QUEUE.md). A killed or
wedged training step auto-resumes from the model dir's latest checkpoint
on relaunch (train_eval_job passes latest_checkpoint as resume_from).

After each step the artifacts are snapshotted into results/ and
committed, so a partially-completed queue still yields committed
evidence.

Run:  python tools/chip_queue_r4.py [--from STEP]
State: /tmp/queue_r4_state.log   Logs: /tmp/queue_r4/<step>.log
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = "/root/repo"
LOGDIR = "/tmp/queue_r4"
STATE = "/tmp/queue_r4_state.log"
MODELS = "/tmp/models"

JOB = [sys.executable, "-m", "soundspaces_tpu.tools.train_eval_job"]

# (name, cmd, {src_in_model_dir_or_abs: results_artifact}, stale_s)
STEPS = [
    (
        "savi",
        # 16 envs: HBM would fit 64 after the replay-remat fix, but the
        # measured marginal throughput CRATERS there (255 steps/s vs ~1000
        # at 16 envs — per-step cost grows 14x, not 4x), so the known-fast
        # recipe wins
        JOB + ["--exp-config", "configs/realistic_semantic.yaml",
               "--model-dir", f"{MODELS}/savi_r4", "--eval-interval", "4"],
        {f"{MODELS}/savi_r4/train.log": "realistic_savi_r4_train.jsonl",
         f"{MODELS}/savi_r4/val.log": "realistic_savi_r4_val.jsonl"},
        1200,
    ),
    (
        "savi_ablate",
        # zeroed-belief ablation at MATCHED compute (same updates, same
        # architecture, same online predictor training — only the belief
        # information the policy sees is zeroed), so beliefs-ON vs ablated
        # is a fair paired comparison (SAViConfig.ablate_beliefs)
        JOB + ["--exp-config", "configs/realistic_semantic.yaml",
               "--model-dir", f"{MODELS}/savi_r4_ablate",
               "--eval-interval", "4",
               "smt.ablate_beliefs=true"],
        {f"{MODELS}/savi_r4_ablate/train.log":
            "realistic_savi_r4_ablate_train.jsonl",
         f"{MODELS}/savi_r4_ablate/val.log":
            "realistic_savi_r4_ablate_val.jsonl"},
        1200,
    ),
    (
        "continuous",
        JOB + ["--exp-config", "configs/realistic_continuous.yaml",
               "--model-dir", f"{MODELS}/cont_r4", "--eval-interval", "8"],
        {f"{MODELS}/cont_r4/train.log": "realistic_continuous_r4_train.jsonl",
         f"{MODELS}/cont_r4/val.log": "realistic_continuous_r4_val.jsonl"},
        1800,
    ),
    (
        "multiscene",
        JOB + ["--exp-config", "configs/realistic_multiscene.yaml",
               "--model-dir", f"{MODELS}/multi_r4", "--eval-interval", "3",
               "trainer.num_updates=1600"],
        {f"{MODELS}/multi_r4/train.log":
            "realistic_multiscene_r4_train.jsonl",
         f"{MODELS}/multi_r4/val.log": "realistic_multiscene_r4_val.jsonl"},
        1800,
    ),
    (
        "avnav",
        JOB + ["--exp-config", "configs/realistic_audiogoal.yaml",
               "--model-dir", f"{MODELS}/avnav_r4", "--eval-interval", "20",
               "trainer.num_updates=12000", "ppo.num_steps=64",
               "ppo.use_linear_entropy_decay=true",
               "ppo.final_entropy_coef=0.05"],
        {f"{MODELS}/avnav_r4/train.log": "realistic_avnav_r4_train.jsonl",
         f"{MODELS}/avnav_r4/val.log": "realistic_avnav_r4_val.jsonl"},
        2400,
    ),
    (
        "avnav_test",
        # the reference golden-number protocol evaluates the held-out TEST
        # split at 1000 episodes (INSTALLATION.md:44-48,
        # savi/config/default.py:283-290)
        JOB + ["--exp-config", "configs/realistic_audiogoal.yaml",
               "--model-dir", f"{MODELS}/avnav_r4", "--skip-train",
               "--eval-best-from", "val.log", "--eval-episodes", "1000",
               "--val-log", "test.log",
               "data.eval_episode_split_path="
               "data/realistic/datasets/audionav/apartment_1k/test/"
               "test.json.gz"],
        {f"{MODELS}/avnav_r4/test.log": "realistic_avnav_r4_test.jsonl"},
        2400,
    ),
    (
        "bench44",
        [sys.executable, "-m", "soundspaces_tpu.tools.bench_realistic",
         "--exp-config", "configs/realistic44_audiogoal.yaml",
         "--num-envs", "64", "128", "256"],
        {"__json_stdout__": "bench_realistic44_r4.jsonl"},
        2400,
    ),
    (
        "pallas",
        [sys.executable, "tools/pallas_chip_probe.py"],
        {"__json_stdout__": "pallas_probe_r4.json"},
        1200,
    ),
    # LAST: AV-WaN absorbs whatever round time remains (a 5200-update
    # retrain is ~2.4 h at the r3 rate and cannot fit alongside the
    # higher-priority steps; the periodic snapshot commits partial curves)
    (
        "avwan",
        JOB + ["--exp-config", "configs/realistic_avwan.yaml",
               "--model-dir", f"{MODELS}/avwan_r4", "--eval-interval", "5",
               "trainer.num_updates=5200"],
        {f"{MODELS}/avwan_r4/train.log": "realistic_avwan_r4_train.jsonl",
         f"{MODELS}/avwan_r4/val.log": "realistic_avwan_r4_val.jsonl"},
        2400,
    ),
]


def log_state(msg: str):
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(STATE, "a") as f:
        f.write(line + "\n")


def run_step(name, cmd, artifacts, stale_s, max_attempts=3) -> bool:
    os.makedirs(LOGDIR, exist_ok=True)
    log_path = os.path.join(LOGDIR, f"{name}.log")
    for attempt in range(1, max_attempts + 1):
        log_state(f"[{name}] attempt {attempt}: {' '.join(cmd)}")
        with open(log_path, "ab") as lf:
            lf.write(f"\n===== attempt {attempt} =====\n".encode())
            lf.flush()
            p = subprocess.Popen(
                cmd, stdout=lf, stderr=subprocess.STDOUT, cwd=REPO
            )
            with open("/tmp/queue_r4_job.pid", "w") as pf:
                pf.write(str(p.pid))
            rc = None
            while rc is None:
                try:
                    rc = p.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    stale = time.time() - os.path.getmtime(log_path)
                    if stale > stale_s:
                        log_state(
                            f"[{name}] WEDGED (log stale {stale:.0f}s) — "
                            "killing for resume"
                        )
                        p.kill()
                        p.wait()
                        rc = -9
        if rc == 0:
            log_state(f"[{name}] done")
            return True
        log_state(f"[{name}] rc={rc}; cooling down 120s for the tunnel")
        time.sleep(120)
    log_state(f"[{name}] FAILED after {max_attempts} attempts")
    return False


def snapshot(artifacts: dict, step: str):
    copied = []
    for src, dst in artifacts.items():
        if src == "__json_stdout__":
            # tools that print their result as JSON lines on stdout: pull
            # the {...} lines out of the step log (last attempt only)
            log_path = os.path.join(LOGDIR, f"{step}.log")
            if not os.path.exists(log_path):
                continue
            lines = [
                ln for ln in open(log_path, errors="replace")
                if ln.startswith("{")
            ]
            if lines:
                with open(os.path.join(REPO, "results", dst), "w") as f:
                    f.writelines(lines)
                copied.append(f"results/{dst}")
            continue
        if os.path.exists(src) and os.path.getsize(src) > 0:
            shutil.copyfile(src, os.path.join(REPO, "results", dst))
            copied.append(f"results/{dst}")
    if copied:
        subprocess.run(["git", "add"] + copied, cwd=REPO)
        subprocess.run(
            ["git", "commit", "-q", "-m",
             f"Realistic chip queue: {step} artifacts"],
            cwd=REPO,
        )
        log_state(f"[{step}] committed {copied}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from", dest="start", default=None)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    started = args.start is None
    for name, cmd, artifacts, stale_s in STEPS:
        if not started:
            if name == args.start:
                started = True
            else:
                continue
        if args.only and name != args.only:
            continue
        ok = run_step(name, cmd, artifacts, stale_s)
        snapshot(artifacts, name)
        if not ok:
            log_state(f"queue continuing past failed step {name}")
    log_state("queue complete")


if __name__ == "__main__":
    main()
