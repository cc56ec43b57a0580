"""Quantized-cursor continuous audio: the precomputed step-window spectra
table must reproduce the generic per-step FFT path BITWISE at equal
cursors (the only semantic change is snapping the random initial cursor,
continuous_simulator.py:344, to a window boundary)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundspaces_tpu.env import DeviceScene, make_episode_bank
from soundspaces_tpu.env.continuous import (
    ContinuousAudioNavEnv,
    ContinuousConfig,
    add_step_window_table,
)
from soundspaces_tpu.scene import make_synthetic_assets
from soundspaces_tpu.scene.graph import MOVE_FORWARD, TURN_LEFT


@pytest.fixture(scope="module")
def world():
    assets = make_synthetic_assets(
        num_nodes_hint=30, sampling_rate=4000, rir_max_len=1200, image_size=8,
        num_sounds=2, max_secs=2, seed=71,
    )
    scene = DeviceScene.from_assets(assets)
    eps = make_episode_bank(assets, 16, seed=72, min_geodesic_hops=2)
    return assets, scene, eps


def test_table_built_and_cursors_quantized(world):
    _, scene, eps = world
    env = ContinuousAudioNavEnv(
        ContinuousConfig(sensors=("audiogoal",)), scene, eps, 4
    )
    assert env.scene.seg_step_fft is not None
    num_sample = env.scene.step_window
    assert num_sample == 1000  # 0.25 s at 4 kHz
    state, _ = env.reset(jax.random.PRNGKey(0))
    assert (np.asarray(state.sample_index) % num_sample == 0).all()
    # cursors stay on the grid across steps
    for _ in range(3):
        state, *_ = env.step(state, jnp.full((4,), MOVE_FORWARD))
        assert (np.asarray(state.sample_index) % num_sample == 0).all()


def test_bitwise_parity_with_generic_path(world):
    _, scene, eps = world
    env_q = ContinuousAudioNavEnv(
        ContinuousConfig(sensors=("audiogoal", "spectrogram")), scene, eps, 4
    )
    env_g = ContinuousAudioNavEnv(
        ContinuousConfig(sensors=("audiogoal", "spectrogram"),
                         quantized_cursor=False), scene, eps, 4
    )
    state, obs_q = env_q.reset(jax.random.PRNGKey(3))
    # same state through the generic per-step-FFT path
    obs_g = jax.vmap(env_g._observe, in_axes=(None, 0))(env_g.scene, state)
    np.testing.assert_array_equal(
        np.asarray(obs_q["audiogoal"]), np.asarray(obs_g["audiogoal"])
    )
    np.testing.assert_array_equal(
        np.asarray(obs_q["spectrogram"]), np.asarray(obs_g["spectrogram"])
    )
    # and after motion (crossfade pair active)
    for a in (MOVE_FORWARD, TURN_LEFT, MOVE_FORWARD):
        state, obs_q, *_ = env_q.step(state, jnp.full((4,), a))
    obs_g = jax.vmap(env_g._observe, in_axes=(None, 0))(env_g.scene, state)
    np.testing.assert_array_equal(
        np.asarray(obs_q["audiogoal"]), np.asarray(obs_g["audiogoal"])
    )


def test_distractor_parity_under_quantization(world):
    assets, scene, eps = world
    eps_d = make_episode_bank(assets, 16, seed=73, min_geodesic_hops=2,
                              with_distractors=True)
    env_q = ContinuousAudioNavEnv(
        ContinuousConfig(sensors=("audiogoal",), has_distractor_sound=True),
        scene, eps_d, 2,
    )
    env_g = ContinuousAudioNavEnv(
        ContinuousConfig(sensors=("audiogoal",), has_distractor_sound=True,
                         quantized_cursor=False), scene, eps_d, 2,
    )
    state, obs_q = env_q.reset(jax.random.PRNGKey(5))
    for _ in range(5):  # run past the shorter sound's length to hit wrap
        state, obs_q, *_ = env_q.step(state, jnp.full((2,), MOVE_FORWARD))
    obs_g = jax.vmap(env_g._observe, in_axes=(None, 0))(env_g.scene, state)
    np.testing.assert_array_equal(
        np.asarray(obs_q["audiogoal"]), np.asarray(obs_g["audiogoal"])
    )


def test_table_skipped_when_lengths_do_not_divide(world):
    _, scene, eps = world
    # step_time 0.3 s -> 1200 samples; 2 s sounds (8000) are not a multiple
    scene2 = add_step_window_table(scene.replace(seg_step_fft=None), 0.3)
    assert scene2.seg_step_fft is None
