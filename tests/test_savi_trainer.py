"""End-to-end SAVi training step: SMT rollout + PPO update + online belief
training on the synthetic world."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundspaces_tpu.env import AudioNavEnv, DeviceScene, EnvConfig, make_episode_bank
from soundspaces_tpu.savi.trainer import SAViConfig, SAViTrainer
from soundspaces_tpu.scene import make_synthetic_assets
from soundspaces_tpu.train import PPOConfig


@pytest.fixture(scope="module")
def savi_setup():
    assets = make_synthetic_assets(
        num_nodes_hint=30, sampling_rate=4000, rir_max_len=1000, image_size=32,
        num_sounds=2, max_secs=2, seed=51,
    )
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(assets, 32, seed=52, min_geodesic_hops=2)
    env = AudioNavEnv(
        EnvConfig(
            sensors=("spectrogram", "depth", "pose", "category",
                     "pointgoal_with_gps_compass"),
            max_episode_steps=20,
        ),
        scene, episodes, num_envs=2,
    )
    trainer = SAViTrainer(
        env,
        PPOConfig(num_steps=4, ppo_epoch=1, num_mini_batch=1),
        SAViConfig(memory_size=8, hidden_size=32, nhead=4),
    )
    return env, trainer


def test_savi_train_step(savi_setup):
    env, trainer = savi_setup
    params, opt_state, bparams, bopt, carry = trainer.init_state(
        jax.random.PRNGKey(0)
    )
    step = jax.jit(trainer.make_train_step())
    p2, o2, b2, bo2, carry2, metrics = step(
        params, opt_state, bparams, bopt, carry, jax.random.PRNGKey(1),
        jnp.float32(0.1), env.scene, env.episodes,
    )
    m = jax.device_get(metrics)
    for k in ("action_loss", "value_loss", "entropy", "reward",
              "belief_mse", "belief_ce"):
        assert np.isfinite(m[k]), (k, m[k])
    # both policy and belief params must have moved
    pdiff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), params, p2),
    )
    bdiff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), bparams, b2),
    )
    assert pdiff > 0 and bdiff > 0
    # memory accumulated rollout steps
    assert float(carry2.policy_state.memory.masks.sum()) > 0


def test_savi_two_steps_stable(savi_setup):
    env, trainer = savi_setup
    params, opt_state, bparams, bopt, carry = trainer.init_state(
        jax.random.PRNGKey(2)
    )
    step = jax.jit(trainer.make_train_step())
    for i in range(2):
        params, opt_state, bparams, bopt, carry, metrics = step(
            params, opt_state, bparams, bopt, carry, jax.random.PRNGKey(3 + i),
            jnp.float32(0.1), env.scene, env.episodes,
        )
    assert np.isfinite(float(metrics["action_loss"]))


def test_savi_evaluate(savi_setup):
    env, trainer = savi_setup
    params, opt_state, bparams, bopt, carry = trainer.init_state(
        jax.random.PRNGKey(5)
    )
    stats = trainer.evaluate(params, bparams, num_episodes=4, max_steps=120)
    assert stats["episode_count"] == 4
    assert 0.0 <= stats["success"] <= 1.0
