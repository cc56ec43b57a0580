"""Training-layer behavior: GAE math, PPO update mechanics, and a smoke
end-to-end train run on the synthetic scene."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundspaces_tpu.env import AudioNavEnv, DeviceScene, EnvConfig, make_episode_bank
from soundspaces_tpu.scene import make_synthetic_assets
from soundspaces_tpu.train import PPOConfig, PPOTrainer, TrainerConfig, compute_gae
from soundspaces_tpu.train.rollout import collect_rollout


def reference_gae(rewards, values, dones, last_value, gamma, tau):
    """Straightforward numpy transcription of GAE with episode-boundary
    masking (rollout_storage.py:112-130 semantics)."""
    T, N = rewards.shape
    adv = np.zeros((T, N))
    gae = np.zeros(N)
    next_v = last_value.copy()
    for t in reversed(range(T)):
        cont = 1.0 - dones[t]
        delta = rewards[t] + gamma * next_v * cont - values[t]
        gae = delta + gamma * tau * cont * gae
        adv[t] = gae
        next_v = values[t]
    return adv, adv + values


def test_gae_matches_reference(rng):
    T, N = 12, 4
    rewards = rng.standard_normal((T, N)).astype(np.float32)
    values = rng.standard_normal((T, N)).astype(np.float32)
    dones = rng.random((T, N)) < 0.2
    last_value = rng.standard_normal(N).astype(np.float32)
    adv, ret = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(last_value), 0.99, 0.95,
    )
    want_adv, want_ret = reference_gae(rewards, values, dones, last_value, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(adv), want_adv, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), want_ret, rtol=1e-4, atol=1e-5)


def test_gae_no_bootstrap_across_done():
    """A terminal step's advantage must ignore the next value."""
    rewards = jnp.asarray([[1.0], [0.0]])
    values = jnp.asarray([[0.0], [5.0]])
    dones = jnp.asarray([[True], [False]])
    last_value = jnp.asarray([100.0])
    adv, _ = compute_gae(rewards, values, dones, last_value, 0.99, 0.95)
    assert float(adv[0, 0]) == pytest.approx(1.0)  # no 0.99*5 bootstrap


@pytest.fixture(scope="module")
def small_world():
    assets = make_synthetic_assets(
        num_nodes_hint=30, sampling_rate=4000, rir_max_len=1200, image_size=32,
        num_sounds=2, max_secs=2, seed=11,
    )
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(assets, 64, seed=12, min_geodesic_hops=2)
    env = AudioNavEnv(
        EnvConfig(sensors=("spectrogram", "depth"), max_episode_steps=20),
        scene, episodes, num_envs=4,
    )
    return env


def make_trainer(env, **kw):
    tc = TrainerConfig(num_envs=4, num_updates=8,
                       checkpoint_folder="/tmp/ssfx_ckpt_test", **kw)
    pc = PPOConfig(num_steps=8, hidden_size=32, ppo_epoch=2, num_mini_batch=2)
    return PPOTrainer(tc, pc, env)


def test_rollout_shapes(small_world):
    env = small_world
    tr = make_trainer(env)
    params, _, carry = tr.init_state(jax.random.PRNGKey(0))
    carry2, ro = jax.jit(
        lambda sc, ep, p, c: collect_rollout(tr._policy_act, p, env, sc, ep, c, 8)
    )(env.scene, env.episodes, params, carry)
    assert ro.actions.shape == (8, 4)
    assert ro.obs["spectrogram"].shape[:2] == (8, 4)
    assert ro.masks.shape == (8, 4) and ro.last_value.shape == (4,)
    # masks at t reflect dones at t-1
    d = np.asarray(ro.dones)[:-1]
    m = np.asarray(ro.masks)[1:]
    np.testing.assert_allclose(m, 1.0 - d.astype(np.float32))


def test_train_step_updates_params_and_runs(small_world):
    env = small_world
    tr = make_trainer(env)
    params, opt_state, carry = tr.init_state(jax.random.PRNGKey(1))
    step = jax.jit(tr.make_train_step())
    p2, o2, carry2, metrics = step(
        params, opt_state, carry, jax.random.PRNGKey(2), jnp.float32(0.1),
        jnp.float32(0.2), env.scene, env.episodes,
    )
    # params changed
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), params, p2),
    )
    assert diff > 0
    for key in ("action_loss", "value_loss", "entropy", "reward"):
        assert np.isfinite(float(metrics[key])), key
    assert float(metrics["entropy"]) > 0


def test_short_training_improves_policy(small_world):
    """A few updates on trivially-short episodes should not diverge and
    should produce finite losses + a reward window. (Full learning curves are
    bench territory; this is the smoke slice of the reference's golden-eval
    strategy, SURVEY.md §4.)"""
    env = small_world
    tr = make_trainer(env)
    logs = []
    tr.cfg = tr.cfg  # frozen dataclass; use as-is
    params, opt_state, carry = None, None, None
    out = tr.train(
        jax.random.PRNGKey(3), num_updates=6,
        log_fn=lambda u, m: logs.append(m),
    )
    params = out[0]
    assert logs, "expected log entries"
    assert all(np.isfinite(m["action_loss"]) for m in logs)

    # evaluate the (briefly trained) policy end to end
    stats = tr.evaluate(params, num_episodes=8, max_steps=200)
    assert stats["episode_count"] == 8
    assert 0.0 <= stats["success"] <= 1.0
    assert stats["distance_to_goal"] >= 0.0


def test_entropy_coef_anneals_linearly(small_world):
    """use_linear_entropy_decay: the coefficient passed to each update is
    final + (init - final) * (1 - u/num_updates), and the trainer logs it
    so long-run anneals are auditable from the metrics JSONL."""
    env = small_world
    tc = TrainerConfig(num_envs=4, num_updates=4, log_interval=1,
                       checkpoint_folder="/tmp/ssfx_ckpt_ent_test")
    pc = PPOConfig(num_steps=4, hidden_size=32, ppo_epoch=1, num_mini_batch=1,
                   entropy_coef=0.25, use_linear_entropy_decay=True,
                   final_entropy_coef=0.05)
    tr = PPOTrainer(tc, pc, env)
    logs = []
    tr.train(jax.random.PRNGKey(0), log_fn=lambda u, m: logs.append((u, m)))
    assert len(logs) == 4
    for u, m in logs:
        frac = 1.0 - u / 4
        want = 0.05 + (0.25 - 0.05) * frac
        assert m["entropy_coef"] == pytest.approx(want), (u, m["entropy_coef"])


def test_checkpoint_roundtrip(small_world, tmp_path):
    env = small_world
    tr = make_trainer(env)
    object.__setattr__(tr.cfg, "checkpoint_folder", str(tmp_path))
    params, opt_state, carry = tr.init_state(jax.random.PRNGKey(4))
    path = tr.save_checkpoint(params, opt_state, update=3)
    p2, o2, upd = tr.load_checkpoint(path, params, opt_state)
    assert upd == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        params, p2,
    )


def test_polling_eval_loop(small_world, tmp_path):
    """BaseRLTrainer.eval equivalent: new checkpoints in the folder get
    evaluated in training order (base_trainer.py:108-122)."""
    from soundspaces_tpu.train.trainer import poll_checkpoint_folder

    env = small_world
    tr = make_trainer(env, checkpoint_interval=100)
    object.__setattr__(tr.cfg, "checkpoint_folder", str(tmp_path))
    object.__setattr__(tr.cfg, "test_episode_count", 2)
    params, opt_state, _ = tr.init_state(jax.random.PRNGKey(5))
    tr.save_checkpoint(params, opt_state, update=1)
    tr.save_checkpoint(params, opt_state, update=2)

    assert poll_checkpoint_folder(str(tmp_path), -1).endswith("ckpt.1")
    assert poll_checkpoint_folder(str(tmp_path), 0).endswith("ckpt.2")
    assert poll_checkpoint_folder(str(tmp_path), 1) is None

    evaluated = []
    results = tr.eval(
        num_episodes=2, max_wait_s=0.0,
        log_fn=lambda c, s: evaluated.append(c),
        model_dir=str(tmp_path),
    )
    assert [c.split(".")[-1] for c in evaluated] == ["1", "2"]
    assert all(s["episode_count"] >= 1 for _, s in results)
    # eval results were logged for best-ckpt selection
    import os

    assert os.path.exists(tmp_path / "eval_log.jsonl")


def test_profile_mode_phase_timers(small_world):
    """profile=True splits wall-clock into env_time (rollout program) and
    pth_time (update program), the reference's ledger
    (av_nav/ppo/ppo_trainer.py:126-155)."""
    env = small_world
    tr = make_trainer(env)
    logs = []
    tr.train(jax.random.PRNGKey(6), num_updates=2, profile=True,
             log_fn=lambda u, m: logs.append(m))
    m = logs[-1]
    assert m["env_time"] > 0 and m["pth_time"] > 0
    assert np.isfinite(m["reward"])


def test_checkpoint_listing_skips_orbax_tmp(tmp_path):
    """In-progress orbax temp dirs must never be returned to a concurrent
    polling eval (they vanish on rename-commit)."""
    import os

    from soundspaces_tpu.train.trainer import (
        latest_checkpoint,
        poll_checkpoint_folder,
    )

    os.makedirs(tmp_path / "ckpt.1")
    os.makedirs(tmp_path / "ckpt.2.orbax-checkpoint-tmp-1723801")
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt.1")
    assert poll_checkpoint_folder(str(tmp_path), 0) is None
