"""Running mean/var input normalizer (the reference's RunningMeanAndVar,
ss_baselines/savi/ddppo/policy/running_mean_and_var.py) and the SE-ResNeXt
backbone (resnet.py:259-311): statistics must UPDATE during rollouts and
FREEZE at eval, and the Chan merge must equal direct moments."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundspaces_tpu.models.resnet import (
    NormStats,
    apply_norm,
    normalize_visual_obs,
    se_resnext50,
    update_norm_stats,
)


def test_chan_merge_equals_direct_moments():
    """Folding batches in one at a time must give the same (mean, var) as
    one pass over all per-image channel means."""
    rng = np.random.default_rng(0)
    batches = [rng.normal(2.0, 3.0, (4, 6, 6, 2)).astype(np.float32)
               for _ in range(5)]
    stats = NormStats.zeros(2)
    for b in batches:
        stats = update_norm_stats(stats, jnp.asarray(b))
    pooled = np.concatenate([b.mean(axis=(1, 2)) for b in batches])  # [B, C]
    np.testing.assert_allclose(np.asarray(stats.mean), pooled.mean(0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats.var), pooled.var(0),
                               rtol=1e-4, atol=1e-5)
    assert float(stats.count) == 20.0


def test_apply_norm_variance_floor():
    stats = NormStats(mean=jnp.zeros(1), var=jnp.full((1,), 1e-6),
                      count=jnp.ones(()))
    out = apply_norm(stats, jnp.ones((2, 3, 3, 1)))
    # stdev floored at sqrt(1e-2) = 0.1 (reference's torch.max clamp)
    np.testing.assert_allclose(np.asarray(out), 10.0, rtol=1e-5)


def test_normalize_visual_obs_update_flag():
    obs = {"depth": jnp.ones((3, 4, 4, 1)) * 5.0}
    stats = NormStats.zeros(1)
    frozen, _ = normalize_visual_obs(stats, obs, update=False)
    assert float(frozen.count) == 0.0
    updated, normed = normalize_visual_obs(stats, obs, update=True)
    assert float(updated.count) == 3.0
    assert float(updated.mean[0]) == pytest.approx(5.0)
    # after folding a constant batch, normalized output is ~0
    np.testing.assert_allclose(np.asarray(normed["depth"]), 0.0, atol=1e-5)


def test_se_resnext_forward():
    net = se_resnext50(output_size=64)
    x = jnp.ones((2, 32, 32, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (2, 64)
    assert np.isfinite(np.asarray(y)).all()
    # grouped conv present: the 3x3 stage-1 kernel has in-channels / 32
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    grouped = [p for p, v in flat if any("Conv_1" in str(k) for k in p)]
    assert grouped


def test_trainer_updates_then_freezes_stats(tmp_path):
    """End-to-end: PPO rollouts fold statistics in (count grows each
    update), checkpoints carry them, eval runs on the frozen values."""
    from soundspaces_tpu.env import AudioNavEnv, DeviceScene, make_episode_bank
    from soundspaces_tpu.env.audionav import EnvConfig
    from soundspaces_tpu.scene import make_synthetic_assets
    from soundspaces_tpu.train.ppo import PPOConfig
    from soundspaces_tpu.train.trainer import PPOTrainer, TrainerConfig

    assets = make_synthetic_assets(
        num_nodes_hint=30, sampling_rate=2000, rir_max_len=500, image_size=32,
        num_sounds=1, max_secs=1, seed=3,
    )
    scene = DeviceScene.from_assets(assets)
    eps = make_episode_bank(assets, 16, seed=4)
    env = AudioNavEnv(EnvConfig(sensors=("spectrogram", "depth")), scene, eps, 4)
    trainer = PPOTrainer(
        TrainerConfig(
            num_envs=4, num_updates=2, log_interval=1, checkpoint_interval=2,
            checkpoint_folder=str(tmp_path / "ck"),
            visual_encoder="resnet18", normalize_visual_inputs=True,
        ),
        PPOConfig(num_steps=4, hidden_size=32, ppo_epoch=1, num_mini_batch=1),
        env,
    )
    params, opt_state, carry = trainer.init_state(jax.random.PRNGKey(0))
    assert carry.norm_stats is not None
    assert float(carry.norm_stats.count) == 0.0
    step = jax.jit(trainer.make_train_step())
    p, o, carry1, _ = step(params, opt_state, carry, jax.random.PRNGKey(1),
                           jnp.float32(0.1), jnp.float32(0.2), scene, eps)
    # 4 steps x 4 envs folded in
    assert float(carry1.norm_stats.count) == 16.0
    p, o, carry2, _ = step(p, o, carry1, jax.random.PRNGKey(2),
                           jnp.float32(0.1), jnp.float32(0.2), scene, eps)
    assert float(carry2.norm_stats.count) == 32.0
    assert np.isfinite(np.asarray(carry2.norm_stats.var)).all()

    # checkpoint round trip carries the stats
    path = trainer.save_checkpoint(p, o, 2, norm_stats=carry2.norm_stats)
    p2, o2, upd, stats2 = trainer.load_checkpoint(
        path, params, opt_state, carry.norm_stats
    )
    np.testing.assert_allclose(
        np.asarray(stats2.count), np.asarray(carry2.norm_stats.count)
    )
    # eval with frozen stats runs and does not error
    res = trainer.evaluate(p2, num_episodes=2, max_steps=30, norm_stats=stats2)
    assert res["episode_count"] >= 1
