"""North-star benchmark: spectrogram observations/sec/chip on a 256-env
Replica-style AudioGoal batch (44.1 kHz RIRs), vs the reference's per-env
scipy pipeline (BASELINE.md / BASELINE.json).

What is measured: the FULL environment step — graph dynamics, RIR gather,
windowed frequency-domain convolution, STFT spectrogram, reward/measures,
auto-reset — batched over NUM_ENVS envs, stepped K times inside one jitted
`lax.scan` (so per-call dispatch is amortized like a real training rollout).
Only a scalar checksum crosses device->host.

Baseline: the reference computes each observation on host CPU with scipy
fftconvolve + librosa STFT (soundspaces/simulator.py:608-666,
tasks/nav.py:86-100); we time exactly that math via
soundspaces_tpu.refimpl on this machine.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

NUM_ENVS = 256
SAMPLING_RATE = 44100
RIR_LEN = 44100  # 1 s binaural RIRs (Replica scale)
NUM_NODES = 64  # keeps the RIR bank ~0.36 GB: the axon tunnel uploads at
# only a few MB/s, and device->host sync is blocked behind pending uploads
SCAN_STEPS = 20
TIMED_CALLS = 10


def build_world():
    import jax
    import jax.numpy as jnp
    from soundspaces_tpu.env import (
        AudioNavEnv,
        DeviceScene,
        EnvConfig,
        make_episode_bank,
    )
    from soundspaces_tpu.scene import make_synthetic_assets

    from soundspaces_tpu.ops.partitioned import segment_block_ffts_from_source

    # small host-side scaffold: graph, sounds, frames (total upload ~30 MB).
    # The heavy RIR bank is GENERATED ON DEVICE below — the tunnel uploads at
    # only a few MB/s, so transferring a 0.4 GB bank starves the benchmark.
    assets = make_synthetic_assets(
        num_nodes_hint=NUM_NODES,
        num_goals=4,
        num_sounds=2,
        sampling_rate=SAMPLING_RATE,
        rir_max_len=256,  # placeholder; replaced by the device-side bank
        max_secs=2,
        image_size=128,
        modalities=("depth",),
        seed=0,
    )
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(assets, 256, seed=1, min_geodesic_hops=2)

    @jax.jit
    def device_banks(points, goal_nodes, sounds, lengths, key):
        n, g = points.shape[0], goal_nodes.shape[0]
        sr, rl = SAMPLING_RATE, RIR_LEN
        delta = points[goal_nodes][None, :, :] - points[:, None, :]  # [N,G,3]
        dist = jnp.maximum(jnp.hypot(delta[..., 0], delta[..., 2]), 0.25)
        src_dir = jnp.arctan2(delta[..., 2], delta[..., 0])  # [N, G]
        t = jnp.arange(rl, dtype=jnp.float32) / sr
        decay = jnp.exp(-t / 0.12)
        rirs = []
        for ai in range(4):
            orientation = jnp.deg2rad(270.0 + 90.0 * ai)
            rel = src_dir - orientation
            ild = 0.5 + 0.4 * jnp.sin(rel)
            d_samp = jnp.round(dist / 343.0 * sr).astype(jnp.int32)
            onset = (
                jnp.arange(rl, dtype=jnp.int32)[None, None, :]
                == d_samp[..., None]
            ).astype(jnp.float32)
            chs = []
            for ch, gain in ((0, 1.0 - ild), (1, ild)):
                key_ch = jax.random.fold_in(key, ai * 2 + ch)
                noise = jax.random.normal(key_ch, (n, g, rl), jnp.float32)
                tail = noise * decay[None, None, :] * (
                    0.05 / jnp.maximum(dist, 0.5)
                )[..., None]
                chs.append(onset * (gain / dist)[..., None] + 0.7 * tail)
            rirs.append(jnp.stack(chs, axis=2))
        rir = jnp.stack(rirs, axis=0).astype(jnp.bfloat16)  # [4,N,G,2,L]

        def seg_for(sound, length, sec):
            return segment_block_ffts_from_source(
                sound, sec * sr, sr, rl, 8192, length=length * sr, wrap=True
            )

        secs = jnp.arange(2)
        seg = jax.vmap(
            lambda snd, ln: jax.vmap(lambda s: seg_for(snd, ln, s))(secs)
        )(sounds, lengths)
        return rir, seg

    rir, seg = device_banks(
        scene.points,
        jnp.asarray(np.asarray(assets.acoustics.goal_nodes)),
        scene.sounds,
        scene.sound_lengths_sec,
        jax.random.PRNGKey(7),
    )
    scene = scene.replace(
        rir=rir, seg_block_fft=seg, rir_max_len=RIR_LEN, conv_block=8192
    )
    env = AudioNavEnv(
        EnvConfig(sensors=("spectrogram", "depth")), scene, episodes, NUM_ENVS
    )
    return assets, env


def _fetch_scalar_with_retry(x, tries: int = 10, sleep_s: float = 15.0) -> float:
    """D2H over the axon tunnel transiently fails (UNIMPLEMENTED) while bulk
    uploads are still streaming; retry with backoff."""
    import jax

    last = None
    for _ in range(tries):
        try:
            return float(x)
        except Exception as e:  # pragma: no cover
            last = e
            time.sleep(sleep_s)
    raise last


def bench_tpu() -> float:
    """Returns spectrogram observations/sec/chip."""
    import jax
    import jax.numpy as jnp

    assets, env = build_world()

    def k_steps(scene, episodes, state, key):
        def body(carry, k):
            state = carry
            actions = jax.random.randint(k, (NUM_ENVS,), 0, 4)
            state, obs, reward, done, info = env.step_pure(
                scene, episodes, state, actions
            )
            # checksum must consume EVERY output element — a partial reduce
            # lets XLA dead-code-eliminate most of the observation pipeline
            chk = (
                sum(jnp.sum(v) for v in obs.values())
                + jnp.sum(reward)
                + sum(jnp.sum(v) for v in info.values())
            )
            return state, chk
        keys = jax.random.split(key, SCAN_STEPS)
        state, sums = jax.lax.scan(body, state, keys)
        return state, jnp.sum(sums)

    k_steps = jax.jit(k_steps)
    scene, episodes = env.scene, env.episodes

    # UPLOAD BARRIER: block_until_ready does not cover the tunnel's slow
    # host->device streaming, and fetches fail while uploads are pending.
    # Heavy banks are device-generated; the remaining host uploads (frames,
    # tables) are ~30 MB. Fetch a scalar that depends on all of them.
    @jax.jit
    def probe_fn(scene):
        return (
            jnp.sum(scene.rir[0, 0, 0, 0, :128].astype(jnp.float32))
            + jnp.sum(jnp.abs(scene.seg_block_fft[0, 0, 0, :16]))
            + sum(
                jnp.sum(v[0, 0]).astype(jnp.float32)
                for v in scene.frames.values()
            )
            + jnp.sum(scene.points)
        )

    t_up = time.time()
    _fetch_scalar_with_retry(probe_fn(scene), tries=25, sleep_s=10.0)
    print(f"bank setup + sync: {time.time()-t_up:.0f}s", file=sys.stderr)

    state, obs = env.reset(jax.random.PRNGKey(0))
    # warmup/compile; fetch = true sync
    state, chk = k_steps(scene, episodes, state, jax.random.PRNGKey(1))
    _fetch_scalar_with_retry(chk, tries=20, sleep_s=10.0)

    t0 = time.time()
    total = 0
    for i in range(TIMED_CALLS):
        state, chk = k_steps(scene, episodes, state, jax.random.PRNGKey(2 + i))
        total += NUM_ENVS * SCAN_STEPS
    # fetch-based sync: the only operation this backend actually blocks on
    v = _fetch_scalar_with_retry(chk, tries=20, sleep_s=10.0)
    dt = time.time() - t0
    print(f"checksum: {v:.4f}; {total} obs in {dt:.2f}s", file=sys.stderr)
    return total / dt


def bench_scipy_baseline() -> float:
    """Single-env reference pipeline rate (obs/sec) on host CPU."""
    from soundspaces_tpu import refimpl

    rng = np.random.default_rng(0)
    source = rng.standard_normal(2 * SAMPLING_RATE).astype(np.float32)
    rir = rng.standard_normal((RIR_LEN, 2)).astype(np.float32) * 0.01
    # warmup
    ag = refimpl.sliding_window_audiogoal(source, rir, 1, SAMPLING_RATE)
    refimpl.compute_spectrogram(ag)
    n = 5
    t0 = time.time()
    for i in range(n):
        ag = refimpl.sliding_window_audiogoal(source, rir, 1, SAMPLING_RATE)
        refimpl.compute_spectrogram(ag)
    return n / (time.time() - t0)


def main():
    result = {
        "metric": "spectrogram obs/sec/chip (full env step, 256-env AudioGoal batch, 44.1 kHz)",
        "value": 0.0,
        "unit": "obs/s",
        "vs_baseline": 0.0,
    }
    try:
        baseline = bench_scipy_baseline()
    except Exception as e:  # pragma: no cover
        print(f"baseline failed: {e!r}", file=sys.stderr)
        baseline = None

    last_err = None
    for attempt in range(2):
        try:
            rate = bench_tpu()
            result["value"] = round(rate, 1)
            if baseline:
                result["vs_baseline"] = round(rate / baseline, 1)
            break
        except Exception as e:  # TPU tunnel flakes: cool down and retry
            last_err = e
            print(f"bench attempt {attempt} failed: {e!r}", file=sys.stderr)
            time.sleep(30)
    else:
        result["error"] = repr(last_err)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
