"""Depth->pointcloud->top-down EgoMap projection (ops/egomap.py) against the
ground-truth occupancy grid — the parity the reference's EgoMap sensor
(soundspaces/tasks/nav.py:235-405) implies: obstacles the camera sees must
land in the right top-down cells, and nothing may be hallucinated."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundspaces_tpu.ops.egomap import depth_to_egomap, egomap_at_pose
from soundspaces_tpu.ops.raycast import render_depth

RES = 0.1


def _wall_world():
    """Free space with a solid wall at x >= 2.0 m."""
    occ = np.ones((40, 40), np.float32)
    occ[:, 20:] = 0.0
    return jnp.asarray(occ)


def test_wall_ahead_lands_at_right_distance():
    occ = _wall_world()
    x, z, heading = 1.0, 2.0, 0.0  # facing +x, wall 1.0 m ahead
    m = egomap_at_pose(occ, x, z, heading, map_size=31, resolution=RES,
                       depth_hw=96, morphological_close=False)
    obstacle = np.asarray(m[..., 0])
    c = 15
    rows = np.nonzero(obstacle.max(axis=1))[0]
    assert rows.size, "wall not detected"
    # nearest obstacle row ~ 10 cells ahead of center (1.0 m / 0.1 m)
    nearest = c - rows.max()
    assert abs(nearest - 10) <= 1, f"wall at {nearest} cells, expected 10"
    # nothing closer than the wall
    assert obstacle[c - 8 :, :].max() == 0.0


def test_no_hallucinated_obstacles_vs_occupancy():
    """Every projected obstacle cell must map back to a blocked occupancy
    cell (within 1 cell of discretization)."""
    rng = np.random.default_rng(0)
    occ = np.ones((50, 50), np.float32)
    occ[:10] = 0; occ[-10:] = 0; occ[:, :10] = 0; occ[:, -10:] = 0
    for _ in range(12):  # clutter blocks
        r, q = rng.integers(14, 42, 2)
        occ[r : r + 2, q : q + 2] = 0.0
    occ_j = jnp.asarray(occ)
    for heading in (0.0, np.pi / 2, 1.1, -2.3):
        x, z = 2.5, 2.5
        m = egomap_at_pose(occ_j, x, z, heading, map_size=31, resolution=RES,
                           depth_hw=96, morphological_close=False)
        obstacle = np.asarray(m[..., 0])
        c = 15
        rows, cols = np.nonzero(obstacle > 0.5)
        fwd = (c - rows) * RES
        lat = (cols - c) * RES
        wx = x + fwd * np.cos(heading) - lat * np.sin(heading)
        wz = z + fwd * np.sin(heading) + lat * np.cos(heading)
        bz, bx = np.nonzero(occ < 0.5)
        for WX, WZ in zip(wx, wz):
            d = np.min(np.hypot(bz - WZ / RES, bx - WX / RES))
            # within 2 cells of a real wall (depth-march + rounding slack)
            assert d < 2.0, f"obstacle hallucinated {d:.1f} cells from walls"


def test_explored_is_partial_not_omniscient():
    """Cells behind the camera must stay unexplored — the partial
    observability the ground-truth crop lacked (VERDICT: the reference
    agent cannot see behind itself)."""
    occ = _wall_world()
    m = egomap_at_pose(occ, 1.0, 2.0, 0.0, map_size=31, resolution=RES,
                       depth_hw=96)
    explored = np.asarray(m[..., 1])
    c = 15
    # in front (facing +x => lateral axis = +col... forward is up): rows < c
    assert explored[: c - 2, :].max() > 0.5
    # behind the agent (rows > c): nothing observed except the agent cell
    behind = explored[c + 2 :, :]
    assert behind.sum() <= 2, "explored leaked behind the camera"


def test_batched_vmap_and_close():
    occ = _wall_world()
    xs = jnp.asarray([1.0, 1.4]); zs = jnp.asarray([2.0, 2.2])
    hs = jnp.asarray([0.0, 0.5])
    f = jax.vmap(lambda x, z, h: egomap_at_pose(occ, x, z, h, depth_hw=48))
    out = f(xs, zs, hs)
    assert out.shape == (2, 31, 31, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_env_sensor_from_depth_vs_oracle_crop():
    """The env's egomap sensor in projection mode agrees with the
    ground-truth crop oracle on obstacle cells it marks, and is strictly
    less omniscient on explored."""
    from soundspaces_tpu.env import AudioNavEnv, DeviceScene, make_episode_bank
    from soundspaces_tpu.env.audionav import EnvConfig
    from soundspaces_tpu.scene import make_synthetic_assets

    assets = make_synthetic_assets(
        num_nodes_hint=40, sampling_rate=2000, rir_max_len=500,
        image_size=16, num_sounds=1, max_secs=1, seed=5,
    )
    scene = DeviceScene.from_assets(assets)
    eps = make_episode_bank(assets, 8, seed=1)
    env_d = AudioNavEnv(
        EnvConfig(sensors=("egomap",), egomap_from_depth=True), scene, eps, 2
    )
    env_o = AudioNavEnv(
        EnvConfig(sensors=("egomap",), egomap_from_depth=False), scene, eps, 2
    )
    s1, o1 = env_d.reset(jax.random.PRNGKey(0))
    s2, o2 = env_o.reset(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(s1.node), np.asarray(s2.node))
    proj = np.asarray(o1["egomap"])
    oracle = np.asarray(o2["egomap"])
    assert proj.shape == oracle.shape == (2, 31, 31, 2)
    # projected obstacles only where the oracle has walls (1-cell dilation
    # tolerance for discretization + the morphological close)
    for i in range(2):
        walls = oracle[i, ..., 0] > 0.5
        dil = np.zeros_like(walls)
        for dr in (-1, 0, 1):
            for dq in (-1, 0, 1):
                dil |= np.roll(np.roll(walls, dr, 0), dq, 1)
        marked = proj[i, ..., 0] > 0.5
        false_pos = marked & ~dil
        assert false_pos.sum() <= 3, f"env {i}: {false_pos.sum()} false walls"
    # partial observability: projection explores strictly less than the
    # omniscient crop (which claims everything explored)
    assert proj[..., 1].sum() < oracle[..., 1].sum()
