"""Semantic AudioNav additions: distractor mixing, sound duration, SWS."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundspaces_tpu import refimpl
from soundspaces_tpu.env import AudioNavEnv, DeviceScene, EnvConfig, make_episode_bank
from soundspaces_tpu.scene import make_synthetic_assets
from soundspaces_tpu.scene.graph import STOP, TURN_LEFT


@pytest.fixture(scope="module")
def sem_world():
    assets = make_synthetic_assets(
        num_nodes_hint=30, sampling_rate=4000, rir_max_len=1000, image_size=8,
        num_sounds=3, max_secs=2, seed=61,
    )
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(
        assets, 32, seed=62, min_geodesic_hops=2, duration_sec=3,
        with_distractors=True,
    )
    return assets, scene, episodes


def test_distractor_mixing_matches_reference(sem_world):
    """audiogoal with distractor == goal conv + distractor conv
    (simulator.py:649-664)."""
    assets, scene, episodes = sem_world
    cfg_d = EnvConfig(sensors=("audiogoal",), has_distractor_sound=True,
                      everlasting=False)
    cfg_n = EnvConfig(sensors=("audiogoal",), everlasting=False)
    env_d = AudioNavEnv(cfg_d, scene, episodes, 2)
    env_n = AudioNavEnv(cfg_n, scene, episodes, 2)
    state, obs_d = env_d.reset(jax.random.PRNGKey(0))
    _, obs_n = env_n.reset(jax.random.PRNGKey(0))

    ac = assets.acoustics
    i = 0
    node = int(state.node[i]); rot = int(state.rot_idx[i])
    az = (4 - rot) % 4
    d_sound = int(state.distractor_sound_id[i])
    d_slot = int(state.distractor_slot[i])
    assert d_sound >= 0 and d_slot >= 0
    d_rir = np.asarray(ac.rir[az, node, d_slot])
    d_src = np.asarray(
        ac.sounds[d_sound][: int(ac.sound_lengths_sec[d_sound]) * ac.sampling_rate]
    )
    want_d = refimpl.sliding_window_audiogoal(
        d_src, d_rir.T, int(state.audio_index[i]) % max(int(ac.sound_lengths_sec[d_sound]), 1),
        ac.sampling_rate,
    )
    got_mix = np.asarray(obs_d["audiogoal"][i])
    got_clean = np.asarray(obs_n["audiogoal"][i])
    np.testing.assert_allclose(got_mix - got_clean, want_d, rtol=5e-3, atol=5e-4)


def test_sound_duration_silences_audio(sem_world):
    """After duration_sec steps the audiogoal is silent
    (simulator.py:610-612) and a successful stop scores SWS
    (semantic_audionav_task.py:213-235)."""
    assets, scene, episodes = sem_world
    env = AudioNavEnv(
        EnvConfig(sensors=("audiogoal",), everlasting=False,
                  max_episode_steps=50),
        scene, episodes, 2,
    )
    state, obs = env.reset(jax.random.PRNGKey(1))
    assert float(np.abs(np.asarray(obs["audiogoal"])).sum()) > 0
    for _ in range(4):  # duration_sec=3 -> silent after step 4
        state, obs, _, done, info = env.step(state, jnp.full((2,), TURN_LEFT))
    assert not np.any(np.asarray(done))
    assert float(np.abs(np.asarray(obs["audiogoal"])).sum()) == 0.0

    # stop at goal while silent -> SWS == success == 1
    at_goal = state.replace(node=state.goal_node)
    _, _, _, done, info = env.step(at_goal, jnp.full((2,), STOP))
    assert np.all(np.asarray(done))
    np.testing.assert_allclose(np.asarray(info["success"]), 1.0)
    np.testing.assert_allclose(np.asarray(info["sws"]), 1.0)


def test_sws_zero_when_audible(sem_world):
    assets, scene, episodes = sem_world
    env = AudioNavEnv(
        EnvConfig(sensors=("spectrogram",), everlasting=True,
                  max_episode_steps=50),
        scene, episodes, 2,
    )
    state, _ = env.reset(jax.random.PRNGKey(2))
    at_goal = state.replace(node=state.goal_node)
    _, _, _, done, info = env.step(at_goal, jnp.full((2,), STOP))
    np.testing.assert_allclose(np.asarray(info["success"]), 1.0)
    np.testing.assert_allclose(np.asarray(info["sws"]), 0.0)
