"""Data-parallel (shard_map over 8-CPU mesh) training step — the multi-chip
path the driver also exercises via __graft_entry__.dryrun_multichip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundspaces_tpu.env import AudioNavEnv, DeviceScene, EnvConfig, make_episode_bank
from soundspaces_tpu.scene import make_synthetic_assets
from soundspaces_tpu.train import PPOConfig, PPOTrainer, TrainerConfig
from soundspaces_tpu.train.parallel import (
    DP_AXIS,
    data_parallel_step,
    make_mesh,
    replicate,
    shard_batch_env_axis,
)


@pytest.fixture(scope="module")
def dp_setup():
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should provide 8 virtual CPU devices"
    num_envs = 2 * n_dev
    assets = make_synthetic_assets(
        num_nodes_hint=30, sampling_rate=4000, rir_max_len=1000, image_size=16,
        num_sounds=2, max_secs=2, seed=21,
    )
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(assets, 64, seed=22, min_geodesic_hops=2)
    env = AudioNavEnv(
        EnvConfig(sensors=("spectrogram", "depth"), max_episode_steps=10),
        scene, episodes, num_envs,
    )
    trainer = PPOTrainer(
        TrainerConfig(num_envs=num_envs),
        PPOConfig(num_steps=4, hidden_size=16, ppo_epoch=1, num_mini_batch=1),
        env,
    )
    return trainer, num_envs


def test_dp_train_step_runs_and_replicates(dp_setup):
    trainer, num_envs = dp_setup
    mesh = make_mesh()
    params, opt_state, carry = trainer.init_state(jax.random.PRNGKey(0))
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    carry = shard_batch_env_axis(mesh, carry, num_envs)

    step = jax.jit(
        data_parallel_step(
            mesh, trainer.make_train_step(axis_name=DP_AXIS), num_envs
        )
    )
    p2, o2, carry2, metrics = step(
        params, opt_state, carry, jax.random.PRNGKey(1), jnp.float32(0.1),
        jnp.float32(0.2), trainer.env.scene, trainer.env.episodes,
    )
    m = jax.device_get(metrics)
    assert all(np.isfinite(v) for v in m.values())
    # params must remain fully replicated (same value on all shards)
    leaf = jax.tree.leaves(p2)[0]
    assert leaf.sharding.is_fully_replicated
    # carry keeps its env sharding
    assert not carry2.hidden.sharding.is_fully_replicated


def test_dp_matches_single_device_gradients(dp_setup):
    """One DP step on 8 shards must equal the same step on one device (same
    rollout data => pmean(grads) == global grad). We verify on a crafted
    rollout where shard RNG does not matter: evaluate the update directly."""
    trainer, num_envs = dp_setup
    import optax
    from soundspaces_tpu.train.ppo import ppo_update
    from soundspaces_tpu.train.rollout import collect_rollout

    params, opt_state, carry = trainer.init_state(jax.random.PRNGKey(3))
    # single-device rollout as common data
    env = trainer.env
    carry, rollout = jax.jit(
        lambda sc, ep, p, c: collect_rollout(
            trainer._policy_act, p, env, sc, ep, c, 4
        )
    )(env.scene, env.episodes, params, carry)

    p1, o1, m1 = jax.jit(
        lambda p, o, r, k: ppo_update(
            p, o, trainer.optimizer, trainer._policy_evaluate, r, k,
            trainer.ppo, jnp.float32(0.1), axis_name=None,
        )
    )(params, opt_state, rollout, jax.random.PRNGKey(4))

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh()

    # rollout leaves are time-major [T=4, N, ...] except initial_hidden
    # [N, H] and last_value [N]; shard the env axis in both layouts
    def spec(x):
        if x.ndim >= 2 and x.shape[0] == 4 and x.shape[1] == num_envs:
            return P(None, DP_AXIS)
        return P(DP_AXIS, *([None] * (x.ndim - 1)))

    ro_specs = jax.tree.map(spec, rollout)

    def dp_fn(p, o, r, k):
        return ppo_update(
            p, o, trainer.optimizer, trainer._policy_evaluate, r, k,
            trainer.ppo, jnp.float32(0.1), axis_name=DP_AXIS,
        )

    p2, o2, m2 = jax.jit(
        shard_map(
            dp_fn, mesh=mesh,
            in_specs=(P(), P(), ro_specs, P()),
            out_specs=(P(), P(), P()),
            check_rep=False,
        )
    )(params, opt_state, rollout, jax.random.PRNGKey(4))

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        ),
        p1, p2,
    )


def test_trainer_train_with_mesh(dp_setup, tmp_path):
    """PPOTrainer.train(mesh=...) runs the sharded step end to end."""
    import dataclasses

    from soundspaces_tpu.train import PPOConfig, PPOTrainer, TrainerConfig

    trainer, num_envs = dp_setup
    mesh_trainer = PPOTrainer(
        dataclasses.replace(
            trainer.cfg, num_updates=2, log_interval=1,
            checkpoint_folder=str(tmp_path),
        ),
        trainer.ppo,
        trainer.env,
        mesh=make_mesh(),
    )
    logs = []
    mesh_trainer.train(jax.random.PRNGKey(9), num_updates=2,
                       log_fn=lambda u, m: logs.append(m))
    assert logs and np.isfinite(logs[-1]["reward"])


def test_savi_dp_train_step():
    """SAVi's full step (SMT memory + belief predictor) under shard_map over
    the 8-device mesh: belief + policy grads pmean across shards
    (BeliefPredictorDDP role, savi/ddppo/algo/ddppo_trainer.py:90-97)."""
    from soundspaces_tpu.savi.trainer import SAViConfig, SAViTrainer
    from soundspaces_tpu.train.parallel import savi_data_parallel_step

    n_dev = len(jax.devices())
    num_envs = 2 * n_dev
    assets = make_synthetic_assets(
        num_nodes_hint=24, sampling_rate=4000, rir_max_len=800, image_size=16,
        num_sounds=2, max_secs=2, seed=61,
    )
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(assets, 64, seed=62, min_geodesic_hops=2)
    env = AudioNavEnv(
        EnvConfig(
            sensors=("spectrogram", "depth", "pose", "category",
                     "pointgoal_with_gps_compass"),
            max_episode_steps=10,
        ),
        scene, episodes, num_envs=num_envs,
    )
    trainer = SAViTrainer(
        env,
        PPOConfig(num_steps=3, ppo_epoch=1, num_mini_batch=1),
        SAViConfig(memory_size=6, hidden_size=32, nhead=4),
    )
    params, opt_state, bparams, bopt, carry = trainer.init_state(
        jax.random.PRNGKey(0)
    )
    mesh = make_mesh()
    params, opt_state = replicate(mesh, params), replicate(mesh, opt_state)
    bparams, bopt = replicate(mesh, bparams), replicate(mesh, bopt)
    carry = shard_batch_env_axis(mesh, carry, num_envs)
    step = jax.jit(savi_data_parallel_step(
        mesh, trainer.make_train_step(axis_name=DP_AXIS), num_envs
    ))
    p2, o2, b2, bo2, carry2, metrics = step(
        params, opt_state, bparams, bopt, carry, jax.random.PRNGKey(1),
        jnp.float32(0.1), env.scene, env.episodes,
    )
    m = jax.device_get(metrics)
    for k in ("action_loss", "value_loss", "reward", "belief_mse"):
        assert np.isfinite(m[k]), (k, m[k])
    pdiff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), params, p2),
    )
    bdiff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), bparams, b2),
    )
    assert pdiff > 0 and bdiff > 0


def test_memory_sharded_attention_exact():
    """Attention with the SMT memory axis sharded over the 8-device mesh is
    EXACT vs single-device full attention (the SURVEY §5 long-context
    growth path: blockwise softmax over ICI)."""
    from soundspaces_tpu.ops.sharded_attention import (
        memory_sharded_attention_fn,
    )

    rng = np.random.default_rng(0)
    n, m, h, d = 4, 64, 4, 16  # M sharded 8 ways -> 8 per device
    q = rng.standard_normal((n, h, d)).astype(np.float32)
    k = rng.standard_normal((n, m, h, d)).astype(np.float32)
    v = rng.standard_normal((n, m, h, d)).astype(np.float32)
    mask = (rng.random((n, m)) > 0.3).astype(np.float32)
    mask[0, :] = 0.0
    mask[0, 5] = 1.0  # nearly-empty memory still well-defined

    # reference: plain masked softmax attention
    logits = np.einsum("nhd,nmhd->nhm", q, k) / np.sqrt(d)
    logits = np.where(mask[:, None, :] > 0, logits, -1e30)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = np.where(mask[:, None, :] > 0, p, 0.0)
    want = np.einsum("nhm,nmhd->nhd", p, v) / p.sum(-1, keepdims=True)

    # 2-D mesh: batch on 'dp' (unused here), memory shards on 'mem' — the
    # composition the module documents
    from jax.sharding import Mesh

    devices = np.array(jax.devices()).reshape(2, 4)
    mesh = Mesh(devices, ("dp", "mem"))
    fn = jax.jit(memory_sharded_attention_fn(mesh, "mem"))
    got = np.asarray(fn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # differentiable end to end (the SMT trains through its attention)
    def loss(q_, k_, v_):
        return fn(q_, k_, v_, jnp.asarray(mask)).sum()

    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    for g in grads:
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).sum()) > 0


def test_sharded_scene_banks_exact():
    """MP3D-scale HBM path: scene banks sharded over a mesh axis on the
    node dimension produce IDENTICAL env observations (XLA inserts the
    gather collectives), and each device holds 1/N of the RIR bank."""
    import numpy as np
    from jax.sharding import Mesh

    from soundspaces_tpu.env import AudioNavEnv, DeviceScene, EnvConfig, make_episode_bank
    from soundspaces_tpu.env.sharding import bank_bytes_per_device, shard_scene_banks
    from soundspaces_tpu.scene import make_synthetic_assets
    from soundspaces_tpu.scene.graph import MOVE_FORWARD

    # hint=80/seed=5 yields exactly 80 walkable nodes -> true 8-way split
    assets = make_synthetic_assets(
        num_nodes_hint=80, sampling_rate=4000, rir_max_len=1500,
        image_size=8, num_sounds=2, max_secs=2, seed=5,
    )
    scene = DeviceScene.from_assets(assets)
    n = scene.points.shape[0]
    assert n % 8 == 0, n
    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs), ("bank",))
    sharded = shard_scene_banks(mesh, scene, "bank")
    # each device holds 1/N of the node axis
    shard_shapes = [s.data.shape for s in sharded.rir.addressable_shards]
    assert shard_shapes[0][1] == n // len(devs)
    assert bank_bytes_per_device(scene, len(devs)) < (
        bank_bytes_per_device(scene, 1)
    ) or len(devs) == 1

    episodes = make_episode_bank(assets, 16, seed=4, min_geodesic_hops=2)
    cfg = EnvConfig(sensors=("spectrogram", "depth"))
    env_r = AudioNavEnv(cfg, scene, episodes, 4)
    env_s = AudioNavEnv(cfg, sharded, episodes, 4)
    sr_state, obs_r = env_r.reset(jax.random.PRNGKey(0))
    ss_state, obs_s = env_s.reset(jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(obs_r["spectrogram"]), np.asarray(obs_s["spectrogram"]),
        rtol=1e-5, atol=1e-5,
    )
    for _ in range(3):
        sr_state, obs_r, r1, d1, _ = env_r.step(
            sr_state, jnp.full((4,), MOVE_FORWARD)
        )
        ss_state, obs_s, r2, d2, _ = env_s.step(
            ss_state, jnp.full((4,), MOVE_FORWARD)
        )
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(obs_r["spectrogram"]),
            np.asarray(obs_s["spectrogram"]), rtol=1e-5, atol=1e-5,
        )
