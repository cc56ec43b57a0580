"""Minimal SS2.0-style smoke test (examples/minimal_example.py:8-38 of the
reference): build a scene, place a sound source, render one audio
observation at a pose, and write data/output.wav. Runs on CPU or TPU.

    python examples/minimal_example.py
"""

import os

import numpy as np

import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from soundspaces_tpu.env import DeviceScene, make_episode_bank
from soundspaces_tpu.env.continuous import (
    ContinuousAudioNavEnv,
    ContinuousConfig,
)
from soundspaces_tpu.scene import make_synthetic_assets


def main(out_path: str = "data/output.wav"):
    sr = 16000
    assets = make_synthetic_assets(
        num_nodes_hint=60, sampling_rate=sr, rir_max_len=sr // 2,
        num_sounds=1, max_secs=2, image_size=64, seed=0,
    )
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(assets, 8, seed=1, min_geodesic_hops=2)
    env = ContinuousAudioNavEnv(
        ContinuousConfig(sensors=("audiogoal", "spectrogram")),
        scene, episodes, num_envs=1,
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    # walk forward a few steps, concatenating the step audio like the
    # reference's tutorial does with its IR convolution output
    chunks = [np.asarray(obs["audiogoal"][0])]
    for _ in range(8):
        state, obs, _, _, _ = env.step(state, jnp.ones(1, jnp.int32))
        chunks.append(np.asarray(obs["audiogoal"][0]))
    num_sample = int(sr * env.config.step_time)
    track = np.concatenate([c[:, :num_sample] for c in chunks], axis=1).T

    from scipy.io import wavfile

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    peak = np.abs(track).max() or 1.0
    wavfile.write(out_path, sr, (track / peak * 32767).astype(np.int16))
    print(f"wrote {out_path}: {track.shape[0]/sr:.2f}s binaural audio")
    print("spectrogram shape:", tuple(obs["spectrogram"].shape[1:]))


if __name__ == "__main__":
    main()
