"""Round-5 serial TPU chip work queue.

Picks up after the carried-over round-4 queue (tools/chip_queue_r4.py)
finishes its pallas step: the remaining VERDICT-r4 evidence items in
priority order. Same driver discipline as r4 — one subprocess at a time,
stale-log watchdog for tunnel wedges, auto-resume from the model dir's
latest checkpoint, artifacts snapshotted into results/ and committed
after each step.

Steps (VERDICT-r4 priority, cheap/certain artifacts front-loaded):
  0. pallas / multiscene — re-runs of the two r4 steps that failed on
     real bugs (probe sys.path; stack_scenes D2H), both fixed
  1. bench_profile — one-shot attribution of the flat north-star bench
     (25 min, certain — runs before the long trainings)
  2. cont_short   — short-horizon (4-16 hop) continuous train: the r4
                    full-range run was budget/horizon-starved, not buggy
                    (see configs/realistic_continuous_short.yaml header)
  3. savi_ext / savi_ablate_ext — extend both SAVi ablation arms to
     4000 updates (both still rising at the 2000-update budget)
  4. avwan_a/b    — annealed retrain in two stages (complete artifact at
     2600 before the 5200 continuation), then the oracle-vs-policy probe

Run:  python tools/chip_queue_r5.py [--from STEP] [--only STEP]
State: /tmp/queue_r5_state.log   Logs: /tmp/queue_r5/<step>.log
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import time

REPO = "/root/repo"
LOGDIR = "/tmp/queue_r5"
STATE = "/tmp/queue_r5_state.log"
MODELS = "/tmp/models"

JOB = [sys.executable, "-m", "soundspaces_tpu.tools.train_eval_job"]

# (name, cmd, {src_in_model_dir_or_abs: results_artifact}, stale_s)
STEPS = [
    (
        "pallas",
        # re-run of the r4 step that failed 3/3: the probe was invoked by
        # path, which put tools/ (not the repo root) on sys.path; the
        # probe now fixes its own sys.path. Quick (~2 min), so it leads.
        [sys.executable, "tools/pallas_chip_probe.py"],
        {"__json_stdout__": "pallas_probe_r4.json"},
        1200,
    ),
    (
        "multiscene",
        # re-run of the r4 step that failed 3/3 attempts on the chip: the
        # old stack_scenes pulled device banks back with np.asarray — a
        # large D2H fetch the tunnel rejects (UNIMPLEMENTED). Fixed to pad
        # + stack on device (train/multiscene.py); twice-missed
        # VERDICT item, so it runs first.
        JOB + ["--exp-config", "configs/realistic_multiscene.yaml",
               "--model-dir", f"{MODELS}/multi_r5", "--eval-interval", "3",
               "trainer.num_updates=1600"],
        {f"{MODELS}/multi_r5/train.log":
            "realistic_multiscene_r5_train.jsonl",
         f"{MODELS}/multi_r5/val.log": "realistic_multiscene_r5_val.jsonl"},
        1800,
    ),
    (
        "bench_profile",
        [sys.executable, "tools/bench_profile.py"],
        {"__json_stdout__": "bench_profile_r5.json"},
        2400,
    ),
    (
        "cont_short",
        JOB + ["--exp-config", "configs/realistic_continuous_short.yaml",
               "--model-dir", f"{MODELS}/cont_short_r5",
               "--eval-interval", "6"],
        {f"{MODELS}/cont_short_r5/train.log":
            "realistic_continuous_short_r5_train.jsonl",
         f"{MODELS}/cont_short_r5/val.log":
            "realistic_continuous_short_r5_val.jsonl"},
        1800,
    ),
    (
        "savi_ext",
        # resume-from-latest continues ckpt.2000 -> 4000; the lr/entropy
        # schedules recompute against num_updates=4000 (both arms get the
        # identical treatment, so the paired comparison stays fair)
        JOB + ["--exp-config", "configs/realistic_semantic.yaml",
               "--model-dir", f"{MODELS}/savi_r4", "--eval-interval", "4",
               "trainer.num_updates=4000"],
        {f"{MODELS}/savi_r4/train.log": "realistic_savi_r4b_train.jsonl",
         f"{MODELS}/savi_r4/val.log": "realistic_savi_r4b_val.jsonl"},
        1200,
    ),
    (
        "savi_ablate_ext",
        JOB + ["--exp-config", "configs/realistic_semantic.yaml",
               "--model-dir", f"{MODELS}/savi_r4_ablate",
               "--eval-interval", "4", "trainer.num_updates=4000",
               "smt.ablate_beliefs=true"],
        {f"{MODELS}/savi_r4_ablate/train.log":
            "realistic_savi_r4b_ablate_train.jsonl",
         f"{MODELS}/savi_r4_ablate/val.log":
            "realistic_savi_r4b_ablate_val.jsonl"},
        1200,
    ),
    # AV-WaN sized to the remaining round budget: a COMPLETE train+val
    # artifact plus the policy probe must all land before the chip is
    # freed for the driver's end-of-round bench (r3's lesson inverted:
    # a finished 2000-update curve with val + instrumentation beats a
    # cut 5200-update train-only partial)
    (
        "avwan_a",
        JOB + ["--exp-config", "configs/realistic_avwan.yaml",
               "--model-dir", f"{MODELS}/avwan_r5", "--eval-interval", "5",
               "trainer.num_updates=2000"],
        {f"{MODELS}/avwan_r5/train.log": "realistic_avwan_r5_train.jsonl",
         f"{MODELS}/avwan_r5/val.log": "realistic_avwan_r5_val.jsonl"},
        2400,
    ),
    (
        "avwan_probe",
        # learned-policy vs oracle instrumentation on the retrained ckpt
        # (VERDICT-r4 #3's named-cause fallback); runs on the chip — the
        # per-step device_get of small diag arrays matches what the val
        # sweeps already do
        [sys.executable, "-m", "soundspaces_tpu.tools.avwan_probe",
         "--exp-config", "configs/realistic_avwan.yaml",
         "--episodes", "60", "--num-envs", "10", "--no-force-cpu",
         "--policy-checkpoint", f"latest:{MODELS}/avwan_r5/ckpts"],
        {"__json_stdout__": "avwan_policy_probe_r5.json"},
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
            with open("/tmp/queue_r5_job.pid", "w") as pf:
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
            log_path = os.path.join(LOGDIR, f"{step}.log")
            if not os.path.exists(log_path):
                continue
            # LAST attempt only: the step log appends across attempts and
            # re-runs, and a retried tool would otherwise leave stale JSON
            # objects ahead of the good one in the committed artifact
            text = open(log_path, errors="replace").read()
            last = text.split("===== attempt")[-1]
            lines = [
                ln + "\n" if not ln.endswith("\n") else ln
                for ln in last.splitlines(keepends=True)
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
             f"Realistic chip queue r5: {step} artifacts"],
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
