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


def test_semantic_object_and_mpcat40_sensors():
    """SemanticObjectSensor: instance ids -> mpcat40 -> task id (+ RGB);
    MPCAT40Index: goal category's mpcat40 id
    (soundspaces/tasks/nav.py:514-697)."""
    from soundspaces_tpu.env import AudioNavEnv, DeviceScene, EnvConfig, make_episode_bank
    from soundspaces_tpu.scene import make_synthetic_assets
    from soundspaces_tpu.scene.mp3d import (
        NUM_TASK_CATEGORIES,
        TASK_ID_TO_MPCAT40,
        mpcat40_to_task_id_table,
        semantic_palette,
    )

    assets = make_synthetic_assets(
        num_nodes_hint=12, sampling_rate=4000, rir_max_len=800, image_size=16,
        modalities=("depth", "semantic"), max_secs=2, seed=5,
    )
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(assets, 8, seed=6)
    env = AudioNavEnv(
        EnvConfig(sensors=("spectrogram", "semantic_object", "mpcat40_index")),
        scene, episodes, num_envs=2,
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    sem = np.asarray(obs["semantic_object"])
    assert sem.shape == (2, 16, 16)
    # verify the double remap for env 0 against numpy
    node, rot = int(state.node[0]), int(state.rot_idx[0])
    inst = np.asarray(assets.frames.modalities["semantic"])[node, rot, ..., 0]
    want = mpcat40_to_task_id_table()[assets.instance_to_mpcat[inst]]
    np.testing.assert_array_equal(sem[0], want)
    assert sem.max() <= NUM_TASK_CATEGORIES  # unknown class included

    # goal category's mpcat40 id
    mp = np.asarray(obs["mpcat40_index"])
    cat = np.asarray(state.category)
    np.testing.assert_array_equal(mp[:, 0], TASK_ID_TO_MPCAT40[cat])

    # RGB colorization variant
    env_rgb = AudioNavEnv(
        EnvConfig(sensors=("semantic_object",), semantic_to_rgb=True),
        scene, episodes, num_envs=2,
    )
    _, obs_rgb = env_rgb.reset(jax.random.PRNGKey(0))
    rgb = np.asarray(obs_rgb["semantic_object"])
    assert rgb.shape == (2, 16, 16, 3)
    np.testing.assert_array_equal(rgb[0], semantic_palette()[want])
