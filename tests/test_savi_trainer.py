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


def test_savi_checkpoint_roundtrip_and_poll_eval(savi_setup, tmp_path):
    """save_checkpoint -> load_checkpoint restores policy + belief; the
    polling eval() finds the checkpoint and reports its stats."""
    env, trainer = savi_setup
    params, opt_state, bparams, bopt, carry = trainer.init_state(
        jax.random.PRNGKey(3)
    )
    folder = str(tmp_path / "ckpts")
    import os

    os.makedirs(folder)
    trainer.save_checkpoint(folder, params, opt_state, bparams, 7)

    p0, o0, b0, _, _ = trainer.init_state(jax.random.PRNGKey(99))
    p1, _, b1, update = trainer.load_checkpoint(
        folder + "/ckpt.7", p0, o0, b0
    )
    assert int(update) == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(bparams), jax.tree.leaves(b1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    results = trainer.eval(
        checkpoint_folder=folder, num_episodes=2, max_wait_s=0.0, seed=5
    )
    assert len(results) == 1
    ckpt, stats = results[0]
    assert ckpt.endswith("ckpt.7") and stats["update"] == 7.0
    assert np.isfinite(stats["success"])


def test_savi_train_resume(savi_setup, tmp_path):
    """train(resume_from=...) must actually restore and continue from the
    checkpoint's update counter (run.py passes latest_checkpoint for the
    chip queue's wedge-recovery auto-resume) — previously the parameter was
    accepted and silently ignored."""
    env, trainer = savi_setup
    folder = str(tmp_path / "ckpts")
    logged = []
    trainer.train(
        jax.random.PRNGKey(0), num_updates=2, log_fn=None,
        checkpoint_folder=folder, checkpoint_interval=1, log_interval=1,
    )
    from soundspaces_tpu.train.trainer import latest_checkpoint

    ckpt = latest_checkpoint(folder)
    assert ckpt and ckpt.endswith("ckpt.2")
    trainer.train(
        jax.random.PRNGKey(0), num_updates=4,
        log_fn=lambda u, m: logged.append(u),
        checkpoint_folder=folder, checkpoint_interval=1, log_interval=1,
        resume_from=ckpt,
    )
    # resumed at update 2: only updates 2 and 3 run (logged 1-indexed-ish
    # by the loop variable), and the folder gains ckpt.3 / ckpt.4
    assert logged == [2, 3]
    assert latest_checkpoint(folder).endswith("ckpt.4")
