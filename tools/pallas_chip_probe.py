"""Probe: can the axon-tunneled TPU compile + run the Pallas kernels?

The |.|->pool->log1p spectrogram tail (`ops/pallas_kernels.py`) is opt-in
(`spectrogram(..., use_pallas=True)`) because earlier rounds' tunnels could
not compile Pallas remotely. This probe re-attempts on the real chip and
times the Pallas tail against the XLA-fused default on identical inputs,
checking near-exact numerical agreement (max abs error < 1e-5) first;
pallas_ms is only measured once that check passes, so a reported timing
is always a timing of a CORRECT kernel.

Run (chip must be otherwise idle — the tunnel is exclusive):
    python -m tools.pallas_chip_probe
Prints one JSON line: {"pallas_ok": bool, "max_err": float,
 "xla_ms": float, "pallas_ms": float, "error": str}.
"""

from __future__ import annotations

import json
import os
import sys
import time

# invocation-robust: `python tools/pallas_chip_probe.py` puts tools/ (not
# the repo root) on sys.path — the r4 queue's pallas step failed 3/3 on
# exactly this ModuleNotFoundError
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, *args, iters: int = 20) -> float:
    out = fn(*args)
    _ = float(jnp.sum(out))  # real sync (block_until_ready lies on axon)
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    from soundspaces_tpu.ops.stft import spectrogram

    result = {
        "pallas_ok": False,
        "max_err": float("nan"),
        "xla_ms": float("nan"),
        "pallas_ms": float("nan"),
        "error": "",
    }
    dev = jax.devices()[0]
    result["platform"] = dev.platform
    # the north-star sensor shape: 256-env batch of 1 s binaural audio
    key = jax.random.PRNGKey(0)
    audio = jax.random.normal(key, (256, 2, 16000), jnp.float32)

    xla_fn = jax.jit(lambda a: spectrogram(a))
    pallas_fn = jax.jit(lambda a: spectrogram(a, use_pallas=True))
    try:
        ref = xla_fn(audio)
        result["xla_ms"] = _timed(xla_fn, audio)
        out = pallas_fn(audio)
        err = float(jnp.max(jnp.abs(out - ref)))
        result["max_err"] = err
        result["pallas_ok"] = bool(err < 1e-5)
        if result["pallas_ok"]:
            # only time a kernel that agrees — a speed number for a wrong
            # kernel would invite misreading
            result["pallas_ms"] = _timed(pallas_fn, audio)
    except Exception as e:  # noqa: BLE001 - report, don't crash the probe
        result["error"] = repr(e)[:300]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
