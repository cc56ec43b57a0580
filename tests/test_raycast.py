"""Live depth raycaster: geometric sanity against hand-computed distances,
plus the continuous env's pose-exact depth path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundspaces_tpu.ops.raycast import render_depth, render_depth_bank


def test_wall_distance_center_row():
    """Camera facing a wall 2 m away: center-row depth == 2/max_depth with
    perpendicular (z-buffer) correction across columns."""
    res, md = 0.1, 10.0
    occ = np.zeros((60, 60), np.float32)
    occ[10:50, 10:30] = 1.0  # walkable corridor; wall face at x = 3.0 m
    img = np.asarray(render_depth(
        jnp.asarray(occ), jnp.float32(1.0), jnp.float32(3.0),
        jnp.float32(0.0),  # heading 0 = +x
        height=64, width=64, fov_deg=90.0, max_depth=md, resolution=res,
        num_steps=512,
    ))
    assert img.shape == (64, 64, 1)
    center = img[31, 31, 0] * md
    assert 1.9 < center < 2.2, center
    # off-center column: same perpendicular depth (z-buffer convention)
    off = img[31, 48, 0] * md
    assert abs(off - center) < 0.3, (center, off)


def test_floor_gradient_below_horizon():
    """Rows below the horizon see the floor: depth decreases downward."""
    occ = np.ones((100, 100), np.float32)  # open field: no walls
    img = np.asarray(render_depth(
        jnp.asarray(occ), jnp.float32(5.0), jnp.float32(5.0),
        jnp.float32(0.0), height=64, width=64, max_depth=10.0,
        resolution=0.1,
    ))[..., 0]
    col = img[:, 32]
    assert col[33] >= col[50] >= col[63] - 1e-6  # nearer floor further down
    assert col[10] == 1.0  # above horizon, nothing: max_depth


def test_depth_bank_shapes():
    from soundspaces_tpu.env import DeviceScene
    from soundspaces_tpu.scene import make_synthetic_assets

    assets = make_synthetic_assets(num_nodes_hint=10, sampling_rate=4000,
                                   rir_max_len=500, image_size=8, seed=3)
    scene = DeviceScene.from_assets(assets)
    bank = render_depth_bank(scene.occupancy, scene.node_grid_xz,
                             height=16, width=16)
    n = scene.points.shape[0]
    assert bank.shape == (n, 4, 16, 16, 1)
    assert np.isfinite(bank).all() and 0 <= bank.min() and bank.max() <= 1


def test_continuous_live_depth_changes_with_pose():
    from soundspaces_tpu.env import DeviceScene, make_episode_bank
    from soundspaces_tpu.env.continuous import (
        ContinuousAudioNavEnv,
        ContinuousConfig,
    )
    from soundspaces_tpu.scene import make_synthetic_assets
    from soundspaces_tpu.scene.graph import MOVE_FORWARD

    assets = make_synthetic_assets(num_nodes_hint=24, sampling_rate=4000,
                                   rir_max_len=500, image_size=8, seed=4)
    scene = DeviceScene.from_assets(assets)
    env = ContinuousAudioNavEnv(
        ContinuousConfig(sensors=("spectrogram", "depth"), live_depth=True,
                         depth_size=32),
        scene, make_episode_bank(assets, 8, seed=5), num_envs=2,
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["depth"].shape == (2, 32, 32, 1)
    d0 = np.asarray(obs["depth"])
    s1, obs1, _, _, _ = env.step(state, jnp.full((2,), MOVE_FORWARD))
    d1 = np.asarray(obs1["depth"])
    moved = np.asarray(s1.x) != np.asarray(state.x)
    for i in range(2):
        if moved[i]:
            assert np.abs(d1[i] - d0[i]).max() > 1e-4  # pose-exact: changed
