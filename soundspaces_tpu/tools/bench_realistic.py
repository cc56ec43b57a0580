"""Sensor benchmark on the realistic reference-format world.

Measures the FULL environment step (graph dynamics, azimuth RIR gather,
partitioned convolution, STFT spectrogram, measures, auto-reset) batched
over N envs on the ingested realistic world — the 1278-node scene whose
metadata/RIRs/sounds/episodes are read exclusively through the
reference-format loaders (`builder.build_assets`). This is the
realistic-scale companion to the repo-root `bench.py` (which generates
synthetic banks ON DEVICE because the axon tunnel uploads at only a few
MB/s); here the ~3.9 GB traced RIR bank is genuinely uploaded, so expect
~20 min of host->device streaming before the first step.

Timing is synced by a device->host scalar fetch (`block_until_ready`
returns at dispatch, not completion, on the axon tunnel).

Usage:
    python -m soundspaces_tpu.tools.bench_realistic \
        [--exp-config configs/realistic_audiogoal.yaml] [--num-envs 64 128]

Prints one JSON line per env count:
    {"metric": "...", "num_envs": N, "value": obs_per_s, "unit": "obs/s"}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

if os.environ.get("FORCE_CPU"):
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; this is the
    # only reliable way to keep a smoke run off the (exclusive) chip.
    import jax

    jax.config.update("jax_platforms", "cpu")


def _fetch(x, tries: int = 25, sleep_s: float = 8.0) -> float:
    """The only true sync on the tunnel; retries ride out pending uploads."""
    last = None
    for _ in range(tries):
        try:
            return float(x)
        except Exception as e:  # pragma: no cover - tunnel flake path
            last = e
            time.sleep(sleep_s)
    raise last


def bench_env(env, num_envs: int, scan_steps: int, timed_calls: int) -> float:
    import jax
    import jax.numpy as jnp

    scene, episodes = env.scene, env.episodes

    def k_steps(scene, episodes, state, key):
        def body(state, k):
            actions = jax.random.randint(k, (num_envs,), 0, 4)
            state, obs, reward, done, info = env.step_pure(
                scene, episodes, state, actions
            )
            chk = (
                sum(jnp.sum(v) for v in obs.values())
                + jnp.sum(reward)
                + sum(jnp.sum(v) for v in info.values())
            )
            return state, chk

        keys = jax.random.split(key, scan_steps)
        state, sums = jax.lax.scan(body, state, keys)
        return state, jnp.sum(sums)

    k_steps = jax.jit(k_steps)
    state, _ = env.reset(jax.random.PRNGKey(0))
    t_up = time.time()
    state, chk = k_steps(scene, episodes, state, jax.random.PRNGKey(1))
    _fetch(chk)  # warmup: bank upload + compile, fully synced
    print(
        f"[warmup] upload+compile+first-scan {time.time() - t_up:.1f}s",
        file=sys.stderr,
        flush=True,
    )

    t0 = time.time()
    total = 0
    for i in range(timed_calls):
        state, chk = k_steps(scene, episodes, state, jax.random.PRNGKey(2 + i))
        total += num_envs * scan_steps
    v = _fetch(chk)
    dt = time.time() - t0
    print(f"checksum {v:.4f}; {total} obs in {dt:.2f}s", file=sys.stderr)
    return total / dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--exp-config", default="configs/realistic_audiogoal.yaml")
    p.add_argument("--num-envs", type=int, nargs="+", default=[64, 128])
    p.add_argument("--scan-steps", type=int, default=50)
    p.add_argument("--timed-calls", type=int, default=4)
    # past ~128 envs the audio batch loses HBM locality (round-3 realistic
    # bench: 82.6k obs/s at 128 envs but 70.8k at 256); sequential
    # env-chunks inside the jitted step restore it (bitwise-identical —
    # the +41% round-1 synthetic-bench fix). Rungs >= chunk-at are measured
    # both ways.
    p.add_argument("--chunk-at", type=int, default=256)
    p.add_argument("--chunks", type=int, default=2)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from soundspaces_tpu.builder import build_assets, build_env
    from soundspaces_tpu.config import get_config

    # Setup heartbeat until the first bench result (see utils/jobs.py)
    from soundspaces_tpu.utils.jobs import start_setup_heartbeat

    hb_stop = start_setup_heartbeat("bench", stream=sys.stderr)

    cfg = get_config(args.exp_config, [])
    _fetch(jnp.sum(jnp.ones((8, 8))), tries=30)  # establish the D2H channel

    t0 = time.time()
    assets = build_assets(cfg)
    print(f"[ingest] reference-format assets in {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)

    import dataclasses

    shared_scene = None
    for n in args.num_envs:
        variants = [1]
        if args.chunks > 1 and n >= args.chunk_at:
            variants.append(args.chunks)
        for chunks in variants:
            vcfg = dataclasses.replace(
                cfg, env=dataclasses.replace(cfg.env, step_chunks=chunks)
            )
            env = build_env(vcfg, assets=assets, num_envs=n, scene=shared_scene)
            # one host->device upload for the whole ladder (the ~3.9 GB bank
            # streams at only a few MB/s over the tunnel)
            shared_scene = env.scene
            rate = bench_env(env, n, args.scan_steps, args.timed_calls)
            hb_stop.set()  # results flow from here on; wedges stay visible
            print(
                json.dumps(
                    {
                        "metric": (
                            "spectrogram obs/sec/chip (full env step, realistic "
                            f"{assets.graph.num_nodes}-node reference-format world, "
                            f"{cfg.data.sampling_rate / 1000:.1f} kHz)"
                        ),
                        "num_envs": n,
                        "step_chunks": chunks,
                        "value": round(rate, 1),
                        "unit": "obs/s",
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
