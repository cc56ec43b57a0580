"""EgoMap sensor, material tables, ResNet encoders."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundspaces_tpu.env import AudioNavEnv, DeviceScene, EnvConfig, make_episode_bank
from soundspaces_tpu.scene import make_synthetic_assets


@pytest.fixture(scope="module")
def ego_env():
    assets = make_synthetic_assets(num_nodes_hint=30, sampling_rate=4000,
                                   rir_max_len=800, image_size=8, seed=81)
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(assets, 16, seed=82)
    # oracle grid-crop mode: these tests pin the ground-truth-crop
    # semantics; the default depth-projection mode is covered by
    # tests/test_egomap.py
    env = AudioNavEnv(EnvConfig(sensors=("spectrogram", "egomap"),
                                egomap_from_depth=False),
                      scene, episodes, 2)
    return assets, env


def test_egomap_shapes_and_center_free(ego_env):
    assets, env = ego_env
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["egomap"].shape == (2, 31, 31, 2)
    em = np.asarray(obs["egomap"])
    # the agent stands on walkable ground: obstacle channel 0 at center
    assert (em[:, 15, 15, 0] == 0.0).all()
    assert (em[..., 1] == 1.0).all()  # explored everywhere (known map)
    # some obstacles visible in a cluttered scene
    assert em[..., 0].sum() > 0


def test_egomap_rotates_with_heading(ego_env):
    assets, env = ego_env
    state, obs = env.reset(jax.random.PRNGKey(1))
    em0 = np.asarray(obs["egomap"])[0, ..., 0]
    state1, obs1, *_ = env.step(state, jnp.full((2,), 2))  # TURN_LEFT
    em1 = np.asarray(obs1["egomap"])[0, ..., 0]
    if em0.sum() > 0:
        # rotating the agent rotates the egocentric view
        assert not np.array_equal(em0, em1) or np.array_equal(
            em1, np.rot90(em0, k=-1)
        )


def test_material_config(tmp_path):
    from soundspaces_tpu.tools.materials import (
        CATEGORY_TO_MATERIAL,
        material_for_category,
        write_material_config,
    )

    m = material_for_category("curtain")
    assert m["name"] == "curtain" and len(m["absorption"]) == 4
    assert material_for_category("unknown_thing")["name"] == "default"
    path = tmp_path / "materials.json"
    write_material_config(str(path))
    cfg = json.loads(path.read_text())
    assert any(mat["name"] == "carpet" for mat in cfg["materials"])
    for mat in cfg["materials"]:
        assert len(mat["absorption"]) == 4


def test_resnet_encoder():
    from soundspaces_tpu.models.resnet import ResNetVisualEncoder, resnet50

    obs = {"depth": jnp.asarray(np.random.rand(2, 64, 64, 1), jnp.float32)}
    enc = ResNetVisualEncoder(output_size=128)
    params = enc.init(jax.random.PRNGKey(0), obs)
    out = enc.apply(params, obs)
    assert out.shape == (2, 128)
    assert np.isfinite(np.asarray(out)).all()


def test_resnet_policy_variant():
    from soundspaces_tpu.models import AudioNavBaselineNet, CategoricalPolicy

    rng = np.random.default_rng(0)
    obs = {
        "spectrogram": jnp.asarray(rng.standard_normal((2, 65, 26, 2)), jnp.float32),
        "depth": jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32),
    }
    policy = CategoricalPolicy(
        net=AudioNavBaselineNet(hidden_size=64, visual_encoder="resnet18"),
        num_actions=4,
    )
    h = jnp.zeros((2, 64))
    params = policy.init(jax.random.PRNGKey(0), obs, h, jnp.ones(2))
    a, lp, v, _ = policy.apply(
        params, obs, h, jnp.ones(2), jax.random.PRNGKey(1), method=policy.act
    )
    assert a.shape == (2,)


def test_proximity_sensor(ego_env):
    assets, env = ego_env
    import dataclasses

    from soundspaces_tpu.env import AudioNavEnv, EnvConfig

    env2 = AudioNavEnv(
        EnvConfig(sensors=("spectrogram", "proximity")),
        env.scene, env.episodes, 2,
    )
    state, obs = env2.reset(jax.random.PRNGKey(0))
    p = np.asarray(obs["proximity"])
    assert p.shape == (2, 1)
    assert (p > 0).all() and (p <= 2.0).all()


def test_blind_policy():
    """Audio-only observation suites must work (is_blind)."""
    from soundspaces_tpu.models import AudioNavBaselineNet, CategoricalPolicy

    rng = np.random.default_rng(0)
    obs = {"spectrogram": jnp.asarray(
        rng.standard_normal((2, 65, 26, 2)), jnp.float32)}
    policy = CategoricalPolicy(
        net=AudioNavBaselineNet(hidden_size=32), num_actions=4)
    h = jnp.zeros((2, 32))
    params = policy.init(jax.random.PRNGKey(0), obs, h, jnp.ones(2))
    a, *_ = policy.apply(params, obs, h, jnp.ones(2), jax.random.PRNGKey(1),
                         method=policy.act)
    assert a.shape == (2,)
