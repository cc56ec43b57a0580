"""Uneven multi-scene env groups + padded-episode masking in sequential eval.

The reference round-robins scenes over workers without requiring even
divisibility (ss_baselines/common/env_utils.py:65-69), and its eval walks
each scene's episode list exactly once. The TPU analog: MultiSceneEnv group
sizes differ by at most one, and stack_episode_banks marks cycled padding
slots invalid so sequential eval never re-scores a smaller scene's episodes.
"""

import numpy as np

import jax
import jax.numpy as jnp

from soundspaces_tpu.env import AudioNavEnv, EnvConfig, make_episode_bank
from soundspaces_tpu.scene import make_synthetic_assets
from soundspaces_tpu.train.multiscene import (
    MultiSceneEnv,
    stack_episode_banks,
    stack_scenes,
)


def _assets(n, **kw):
    return [
        make_synthetic_assets(
            num_nodes_hint=12 + 4 * i, sampling_rate=4000, rir_max_len=600,
            image_size=16, num_sounds=2, max_secs=2, seed=900 + i, **kw,
        )
        for i in range(n)
    ]


def test_uneven_env_groups():
    """3 scenes, 8 envs -> groups of 3/3/2 (round-robin remainder); every
    group steps in its own scene and outputs concatenate to the full batch."""
    assets_list = _assets(3)
    scene = stack_scenes(assets_list)
    episodes = stack_episode_banks(
        [make_episode_bank(a, 6, seed=50 + i) for i, a in enumerate(assets_list)]
    )
    env = MultiSceneEnv(
        EnvConfig(sensors=("spectrogram",), max_episode_steps=6),
        scene, episodes, num_envs=8,
    )
    assert env.group_sizes == [3, 3, 2]
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["spectrogram"].shape[0] == 8
    # group g's nodes are valid in ITS scene
    nodes = np.asarray(state.node)
    for g, a in enumerate(assets_list):
        lo, hi = env.group_offsets[g], env.group_offsets[g + 1]
        assert (nodes[lo:hi] >= 0).all()
        assert (nodes[lo:hi] < len(a.graph.points)).all()
    for _ in range(4):
        state, obs, r, d, info = env.step(state, jnp.ones(8, jnp.int32))
    assert np.isfinite(np.asarray(obs["spectrogram"])).all()
    assert np.isfinite(np.asarray(r)).all()


def test_padded_episode_valid_mask():
    """stack_episode_banks: the cycled padding slots of a smaller scene are
    marked invalid; real slots stay valid."""
    assets_list = _assets(2)
    banks = [
        make_episode_bank(assets_list[0], 10, seed=1),
        make_episode_bank(assets_list[1], 4, seed=2),
    ]
    episodes = stack_episode_banks(banks)
    valid = np.asarray(episodes.valid)
    assert valid.shape == (2, 10)
    assert valid[0].all()  # full-size scene: all real
    assert valid[1, :4].all() and not valid[1, 4:].any()  # cycled tail


def test_sequential_eval_skips_padded_episodes():
    """End-to-end: sequential eval over a 2-scene env (10 vs 4 episodes)
    scores exactly 14 episodes — the padded duplicates are played for
    lockstep but never counted."""
    from soundspaces_tpu.train import PPOConfig, PPOTrainer, TrainerConfig

    assets_list = _assets(2)
    banks = [
        make_episode_bank(assets_list[0], 10, seed=1),
        make_episode_bank(assets_list[1], 4, seed=2),
    ]
    scene = stack_scenes(assets_list)
    episodes = stack_episode_banks(banks)
    env = MultiSceneEnv(
        EnvConfig(
            sensors=("spectrogram",), max_episode_steps=5,
            episode_sampling="sequential",
        ),
        scene, episodes, num_envs=4,
    )
    trainer = PPOTrainer(
        TrainerConfig(num_envs=4),
        PPOConfig(num_steps=2, hidden_size=16, ppo_epoch=1, num_mini_batch=1),
        env,
    )
    params, _, _ = trainer.init_state(jax.random.PRNGKey(0))
    stats = trainer.evaluate(params, num_episodes=1000)
    # 10 + 4 true episodes; the request clamps to the valid total and the
    # cycled duplicates of scene B are skipped, not re-scored
    assert stats["episode_count"] == 14.0
    assert "ep_valid" not in stats
    assert np.isfinite(stats["distance_to_goal"])


def test_single_scene_eval_unaffected():
    """A plain single-scene env (valid=None) scores every episode as before."""
    from soundspaces_tpu.train import PPOConfig, PPOTrainer, TrainerConfig
    from soundspaces_tpu.env import DeviceScene

    a = _assets(1)[0]
    env = AudioNavEnv(
        EnvConfig(
            sensors=("spectrogram",), max_episode_steps=5,
            episode_sampling="sequential",
        ),
        DeviceScene.from_assets(a), make_episode_bank(a, 6, seed=3), 2,
    )
    trainer = PPOTrainer(
        TrainerConfig(num_envs=2),
        PPOConfig(num_steps=2, hidden_size=16, ppo_epoch=1, num_mini_batch=1),
        env,
    )
    params, _, _ = trainer.init_state(jax.random.PRNGKey(0))
    stats = trainer.evaluate(params, num_episodes=6)
    assert stats["episode_count"] == 6.0
