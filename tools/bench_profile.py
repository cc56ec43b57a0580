"""Profile the north-star bench: where does the per-step time go?

VERDICT-r4 Weak #5: the headline number has been flat for four rounds
(20.79k -> 20.84k obs/s) while kernel work landed; say whether the bench
is even bound by the kernels. This tool attributes the 256-env step time
by DIFFERENCING full-step rates over sensor subsets (each in a fresh
subprocess on the chip, exactly the bench.py harness):

  dynamics+measures   = step with only the trivial collision sensor
  +audiogoal          = adds the partitioned FFT convolution
  +spectrogram        = adds the STFT on top of the convolution
  +depth              = adds the frame-bank gather (the full north-star)

Per-step component time = 1/rate_with - 1/rate_without. Prints ONE JSON
object (results/bench_profile_r5.json artifact).

Run on the chip (exclusive access — never alongside another TPU job):
    python tools/bench_profile.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
CFG = os.environ.get("SS_TPU_PROFILE_CFG", "256,44100,44100,64")

RUNGS = [
    ("dynamics_measures", "collision"),
    ("audiogoal", "audiogoal"),
    ("spectrogram", "spectrogram"),
    ("full", "spectrogram,depth"),
    # the HBM-bandwidth lever: (re, im)-packed bf16 RIR spectra halve the
    # dominant per-step bank gather (bench.py SS_TPU_BF16_FFT). Timed last
    # — if the convolution rung shows the step is conv/gather-bound, this
    # says whether flipping the default would move the headline.
    ("full_bf16_spectra", "spectrogram,depth"),
]


def run_rung(sensors: str, extra_env: dict | None = None) -> float:
    env = dict(os.environ, SS_TPU_SENSORS=sensors, **(extra_env or {}))
    proc = subprocess.run(
        [sys.executable, BENCH, "--single", CFG],
        capture_output=True, text=True, timeout=1500, cwd=REPO, env=env,
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    try:
        return float(json.loads(line)["rate"])
    except Exception as e:
        raise RuntimeError(
            f"rung {sensors!r} failed: {e!r}; stderr tail: "
            + "\n".join(proc.stderr.strip().splitlines()[-4:])
        ) from e


def main():
    out = {"config": CFG, "rates_obs_per_s": {}, "per_step_us": {}}
    rates = {}
    errors = []
    for name, sensors in RUNGS:
        try:
            extra = (
                {"SS_TPU_BF16_FFT": "1"} if name.endswith("bf16_spectra")
                else None
            )
            rates[name] = run_rung(sensors, extra)
            out["rates_obs_per_s"][name] = round(rates[name], 1)
            print(f"[profile] {name} ({sensors}): {rates[name]:.0f} obs/s",
                  file=sys.stderr, flush=True)
        except Exception as e:  # incl. subprocess.TimeoutExpired — one
            # slow/wedged rung must not abort the whole profile JSON
            errors.append(f"{name}: {e}"[:300])
            print(f"[profile] {name} failed: {e}", file=sys.stderr,
                  flush=True)

    def us(name):
        # per-env-step wall time in microseconds (batch-step time / envs)
        return 1e6 / rates[name] if name in rates else None

    if "full" in rates:
        out["per_step_us"]["total_full"] = round(us("full"), 2)
    if "dynamics_measures" in rates:
        out["per_step_us"]["dynamics_measures"] = round(
            us("dynamics_measures"), 2
        )
    if "audiogoal" in rates and "dynamics_measures" in rates:
        out["per_step_us"]["convolution"] = round(
            us("audiogoal") - us("dynamics_measures"), 2
        )
    if "spectrogram" in rates and "audiogoal" in rates:
        out["per_step_us"]["stft"] = round(
            us("spectrogram") - us("audiogoal"), 2
        )
    if "full" in rates and "spectrogram" in rates:
        out["per_step_us"]["depth_gather"] = round(
            us("full") - us("spectrogram"), 2
        )
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
