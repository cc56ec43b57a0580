"""Multi-scene AV-WaN: waypoint training over several scenes at once
(avwan/multiscene.py) — the reference trains av_wan across scene-distributed
workers like every baseline (ss_baselines/common/env_utils.py:36-69)."""

import numpy as np

import jax
import jax.numpy as jnp

from soundspaces_tpu.avwan.env import (
    WaypointConfig,
    build_waypoint_tables,
)
from soundspaces_tpu.avwan.maps import MapperConfig
from soundspaces_tpu.avwan.multiscene import MultiSceneWaypointEnv
from soundspaces_tpu.env import DeviceScene, EnvConfig, make_episode_bank
from soundspaces_tpu.scene import make_synthetic_assets


def _mk(seed, nodes):
    return make_synthetic_assets(
        num_nodes_hint=nodes, sampling_rate=4000, rir_max_len=600,
        image_size=8, num_sounds=2, max_secs=2, seed=seed,
    )


def _env(num_envs=4, episode_counts=(8, 8)):
    assets = [_mk(10, 24), _mk(11, 36)]
    mcfg = MapperConfig(
        internal_map_size=100, geometric_map_size=40, egomap_size=15,
        acoustic_map_size=10,
    )
    wp_cfg = WaypointConfig(prediction_interval=3, mapper=mcfg)
    scenes = [DeviceScene.from_assets(a) for a in assets]
    banks = [
        make_episode_bank(a, n, seed=20 + i, min_geodesic_hops=2)
        for i, (a, n) in enumerate(zip(assets, episode_counts))
    ]
    tables = [build_waypoint_tables(a.graph, mcfg) for a in assets]
    env = MultiSceneWaypointEnv(
        EnvConfig(max_episode_steps=20), wp_cfg, scenes, banks, tables,
        num_envs,
    )
    return assets, env


def test_reset_step_groups():
    """Each scene group's agent nodes live in ITS scene; outputs concatenate
    to the full batch (uneven 3-scene split included via num_envs=5... here
    2 scenes x uneven 5 envs -> groups 3/2)."""
    assets, env = _env(num_envs=5)
    assert env.group_sizes == [3, 2]
    state, obs = env.reset(jax.random.PRNGKey(0))
    # state is group-blocked along the env axis
    nodes = np.asarray(state.base.node)
    assert nodes.shape == (5,)
    for g, a in enumerate(assets):
        lo, hi = env.group_offsets[g], env.group_offsets[g + 1]
        assert (nodes[lo:hi] < len(a.graph.points)).all()
    assert obs["spectrogram"].shape[0] == 5
    wp = jnp.zeros(5, jnp.int32)
    state, obs, reward, done, info = env.step(state, wp)
    assert np.isfinite(np.asarray(reward)).all()
    assert np.isfinite(np.asarray(obs["gm"])).all()
    assert obs["gm"].shape[0] == 5


def test_trainer_step_multiscene():
    """AVWanTrainer's fused train step runs over the multi-scene env with
    tuple banks — finite losses, policy grads from both scenes."""
    from soundspaces_tpu.avwan.trainer import AVWanTrainer
    from soundspaces_tpu.train import PPOConfig, TrainerConfig

    _, env = _env(num_envs=4)
    trainer = AVWanTrainer(
        TrainerConfig(num_envs=4),
        PPOConfig(num_steps=2, hidden_size=32, ppo_epoch=1, num_mini_batch=1),
        env,
    )
    params, opt_state, carry = trainer.init_state(jax.random.PRNGKey(1))
    step = jax.jit(trainer.make_train_step())
    p2, o2, carry2, metrics = step(
        params, opt_state, carry, jax.random.PRNGKey(2), jnp.float32(0.1),
        jnp.float32(0.2), *trainer._bank_args(),
    )
    m = jax.device_get(metrics)
    assert np.isfinite(m["value_loss"]) and np.isfinite(m["reward"])


def test_builder_multiscene_avwan():
    """build_trainer with trainer_name=AVWanTrainer and data.num_scenes=2
    returns a MultiSceneWaypointEnv train/eval pair sharing device banks."""
    from soundspaces_tpu.builder import build_trainer
    from soundspaces_tpu.config import get_config

    cfg = get_config(opts=[
        "trainer_name=AVWanTrainer",
        "trainer.num_envs=4",
        "ppo.num_steps=2", "ppo.hidden_size=32", "ppo.ppo_epoch=1",
        "ppo.num_mini_batch=1",
        "data.num_scenes=2", "data.num_nodes_hint=20",
        "data.sampling_rate=4000", "data.rir_max_len=600",
        "data.image_size=8", "data.num_episodes=8",
        "env.max_episode_steps=12",
    ])
    trainer = build_trainer(cfg)
    env = trainer.env
    assert isinstance(env, MultiSceneWaypointEnv)
    assert env.num_scenes == 2
    # eval env shares the train env's device-resident banks and tables
    assert trainer.eval_env.base.scene[0] is env.base.scene[0]
    assert trainer.eval_env.tables()[1] is env.tables()[1]
    params, opt_state, carry = trainer.init_state(jax.random.PRNGKey(3))
    step = jax.jit(trainer.make_train_step())
    _, _, _, metrics = step(
        params, opt_state, carry, jax.random.PRNGKey(4), jnp.float32(0.1),
        jnp.float32(0.2), *trainer._bank_args(),
    )
    assert np.isfinite(float(jax.device_get(metrics)["reward"]))


def test_multiscene_eval_quota_uneven_banks():
    """Sequential eval over per-scene banks of UNEQUAL sizes (8 vs 3): the
    requested count clamps to the 11-episode quota, and a group that
    exhausts its scene's list keeps stepping for lockstep but is never
    scored again (ep_valid first-pass gate) — the reference's
    walk-each-episode-once protocol (base_trainer.py:184-241)."""
    from soundspaces_tpu.avwan.trainer import AVWanTrainer
    from soundspaces_tpu.train import PPOConfig, TrainerConfig
    import dataclasses

    assets = [_mk(10, 24), _mk(11, 36)]
    mcfg = MapperConfig(
        internal_map_size=100, geometric_map_size=40, egomap_size=15,
        acoustic_map_size=10,
    )
    wp_cfg = WaypointConfig(prediction_interval=3, mapper=mcfg)
    scenes = [DeviceScene.from_assets(a) for a in assets]
    banks = [
        make_episode_bank(a, n, seed=20 + i, min_geodesic_hops=2)
        for i, (a, n) in enumerate(zip(assets, (8, 3)))
    ]
    tables = [build_waypoint_tables(a.graph, mcfg) for a in assets]
    env = MultiSceneWaypointEnv(
        EnvConfig(max_episode_steps=6, episode_sampling="sequential"),
        wp_cfg, scenes, banks, tables, 4,
    )
    trainer = AVWanTrainer(
        TrainerConfig(num_envs=4),
        PPOConfig(num_steps=2, hidden_size=32, ppo_epoch=1, num_mini_batch=1),
        env,
    )
    params, _, _ = trainer.init_state(jax.random.PRNGKey(1))
    stats = trainer.evaluate(params, num_episodes=100, max_steps=120)
    # quota: 8 + 3 — the request for 100 clamps, and the small scene's
    # group (2 envs x 3 episodes) wrapping early must not re-score
    assert stats["episode_count"] <= 11.0
    assert stats["episode_count"] >= 8.0  # both groups contributed
    assert "ep_valid" not in stats
