"""Continuous mode as a full task platform (VERDICT round-1 item #4):
complete measure suite, distractor mixing, semantic episodes
(durations/silence/view-points/SWS) and occupancy-grid walkability —
mirroring tests/test_semantic.py for the continuous sim
(soundspaces/continuous_simulator.py:56-527 + tasks/nav.py:108-232)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundspaces_tpu.env import DeviceScene, make_episode_bank
from soundspaces_tpu.env.continuous import (
    ContinuousAudioNavEnv,
    ContinuousConfig,
)
from soundspaces_tpu.scene import make_synthetic_assets
from soundspaces_tpu.scene.graph import MOVE_FORWARD, STOP, TURN_LEFT


@pytest.fixture(scope="module")
def world():
    assets = make_synthetic_assets(
        num_nodes_hint=40, sampling_rate=4410, rir_max_len=1500, image_size=8,
        num_sounds=3, max_secs=2, seed=51,
    )
    scene = DeviceScene.from_assets(assets)
    return assets, scene


def make_env(world, num_envs=2, with_distractors=False, duration=None,
             neural_field=None, **kw):
    assets, scene = world
    episodes = make_episode_bank(
        assets, 32, seed=52, min_geodesic_hops=2,
        with_distractors=with_distractors, duration_sec=duration,
    )
    cfg = ContinuousConfig(
        sensors=("spectrogram", "audiogoal"), max_episode_steps=50, **kw
    )
    return assets, ContinuousAudioNavEnv(cfg, scene, episodes, num_envs,
                                         neural_field=neural_field)


def test_full_measure_suite_present(world):
    _, env = make_env(world)
    state, obs = env.reset(jax.random.PRNGKey(0))
    _, _, _, _, info = env.step(state, jnp.full((2,), MOVE_FORWARD))
    for key in ("success", "spl", "softspl", "distance_to_goal",
                "normalized_distance_to_goal", "na", "sna", "sws",
                "collisions"):
        assert key in info, key
        assert np.isfinite(np.asarray(info[key])).all(), key


def test_measures_on_success(world):
    """Walk 'forward toward goal' via teleport-free motion until close, then
    STOP: success=1, spl/sna in (0,1], ndtg ~ 0."""
    assets, scene = world
    _, env = make_env(world, num_envs=4)
    state, obs = env.reset(jax.random.PRNGKey(3))
    # steer greedily toward the goal: turn to face it, else move forward
    for t in range(60):
        gx = np.asarray(scene.points)[np.asarray(state.goal_node), 0]
        gz = np.asarray(scene.points)[np.asarray(state.goal_node), 2]
        dx, dz = gx - np.asarray(state.x), gz - np.asarray(state.z)
        dist = np.hypot(dx, dz)
        bearing = np.arctan2(dz, dx)
        head = np.asarray(state.heading)
        delta = (bearing - head + np.pi) % (2 * np.pi) - np.pi
        acts = np.where(
            dist < 0.3, STOP,
            np.where(np.abs(delta) < 0.18, MOVE_FORWARD,
                     np.where(delta < 0, TURN_LEFT, 2 + 1)),  # TURN_RIGHT=3
        )
        state, obs, r, d, info = env.step(state, jnp.asarray(acts, jnp.int32))
        done = np.asarray(d)
        succ = np.asarray(info["success"])
        if (done & (succ > 0)).any():
            i = int(np.nonzero(done & (succ > 0))[0][0])
            assert 0 < float(np.asarray(info["spl"])[i]) <= 1.0 + 1e-6
            assert 0 < float(np.asarray(info["sna"])[i]) <= 1.0 + 1e-6
            assert float(np.asarray(info["normalized_distance_to_goal"])[i]) < 0.2
            assert float(np.asarray(info["softspl"])[i]) > 0
            return
    pytest.fail("greedy steering never succeeded")


def test_distractor_changes_audio_only_when_present(world):
    assets, scene = world
    _, env_d = make_env(world, with_distractors=True,
                        has_distractor_sound=True)
    _, env_p = make_env(world, with_distractors=True,
                        has_distractor_sound=False)
    s1, o1 = env_d.reset(jax.random.PRNGKey(5))
    s2, o2 = env_p.reset(jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(s1.x), np.asarray(s2.x))
    a1, a2 = np.asarray(o1["audiogoal"]), np.asarray(o2["audiogoal"])
    assert np.abs(a1 - a2).max() > 1e-6, "distractor did not mix in"
    # mixing is additive: distractor audio = difference, and it must carry
    # energy in the convolution window
    assert np.isfinite(a1).all()


@pytest.mark.parametrize("source", ["parametric", "neural"])
def test_distractor_mixes_under_fresh_rir_sources(world, source):
    """The semantic task layer drives every simulator mode uniformly
    (semantic_audionav_task.py:174-210): under parametric/neural RIR
    sources the distractor gets its own pose-exact rendered RIR (d_rir)
    and mixes additively, exactly as in bank mode."""
    kw = {"rir_source": source}
    if source == "neural":
        from soundspaces_tpu.ops.neural_rir import NeuralRIRField

        net = NeuralRIRField(hidden=32, num_frames=8)
        params = net.init(jax.random.PRNGKey(0), jnp.zeros(4))
        kw["neural_field"] = (net, params)
    _, env_d = make_env(world, with_distractors=True,
                        has_distractor_sound=True, **kw)
    _, env_p = make_env(world, with_distractors=True,
                        has_distractor_sound=False, **kw)
    s1, o1 = env_d.reset(jax.random.PRNGKey(5))
    s2, o2 = env_p.reset(jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(s1.x), np.asarray(s2.x))
    a1, a2 = np.asarray(o1["audiogoal"]), np.asarray(o2["audiogoal"])
    assert np.isfinite(a1).all()
    assert np.abs(a1 - a2).max() > 1e-6, "distractor did not mix in"
    # and stepping keeps both RIR pairs flowing (crossfade path)
    s1, o1, _, _, _ = env_d.step(s1, jnp.full((2,), MOVE_FORWARD))
    assert np.isfinite(np.asarray(o1["audiogoal"])).all()


def test_duration_silences_audio_and_sws(world):
    """Non-everlasting sources fall silent after duration; stopping at the
    goal after silence scores SWS=1 (semantic_audionav_task.py:213-235)."""
    assets, scene = world
    _, env = make_env(world, duration=1, everlasting=False)
    state, obs = env.reset(jax.random.PRNGKey(7))
    # duration 1 s, step_time 0.25 s -> silent after step 4
    for t in range(6):
        state, obs, r, d, info = env.step(state, jnp.full((2,), TURN_LEFT))
    assert np.abs(np.asarray(obs["audiogoal"])).max() == 0.0, "not silenced"
    # teleport-free SWS check: steer to goal then stop (sound long over)
    for t in range(60):
        gx = np.asarray(scene.points)[np.asarray(state.goal_node), 0]
        gz = np.asarray(scene.points)[np.asarray(state.goal_node), 2]
        dx, dz = gx - np.asarray(state.x), gz - np.asarray(state.z)
        dist = np.hypot(dx, dz)
        bearing = np.arctan2(dz, dx)
        delta = (bearing - np.asarray(state.heading) + np.pi) % (2 * np.pi) - np.pi
        acts = np.where(dist < 0.3, STOP,
                        np.where(np.abs(delta) < 0.18, MOVE_FORWARD,
                                 np.where(delta < 0, TURN_LEFT, 3)))
        state, obs, r, d, info = env.step(state, jnp.asarray(acts, jnp.int32))
        done, succ = np.asarray(d), np.asarray(info["success"])
        if (done & (succ > 0)).any():
            i = int(np.nonzero(done & (succ > 0))[0][0])
            assert float(np.asarray(info["sws"])[i]) == 1.0
            return
    pytest.fail("never reached the goal for the SWS check")


def test_occupancy_walkability_blocks_wall_crossing(world):
    """The default "occupancy" walkability marches the step segment through
    the walkable grid: positions reachable under the round-1 node-radius
    check but separated by a wall are now blocked (the pathfinder.try_step
    role, continuous_simulator.py:464-480)."""
    assets, scene = world
    g = assets.graph
    occ = np.asarray(scene.occupancy)
    node_xz = np.asarray(scene.node_grid_xz)
    # find a node with a blocked 4-neighbor but SOME node within 0.75*grid
    # of the blocked midpoint (i.e. radius check would pass)
    _, env = make_env(world, walkability="occupancy")
    _, env_r = make_env(world, walkability="radius")
    pts = np.asarray(scene.points)
    found = 0
    for n in range(g.num_nodes):
        for r in range(4):
            if g.forward_neighbor[n, r] >= 0:
                continue
            th = np.deg2rad(270.0 - 90.0 * r)
            tx = pts[n, 0] + 0.25 * np.cos(th)
            tz = pts[n, 2] + 0.25 * np.sin(th)
            # radius check at the target
            d2 = (pts[:, 0] - tx) ** 2 + (pts[:, 2] - tz) ** 2
            radius_ok = d2.min() < (g.grid_size * 0.75) ** 2
            occ_ok = bool(
                env._walkable(
                    scene, jnp.float32(pts[n, 0]), jnp.float32(pts[n, 2]),
                    jnp.float32(tx), jnp.float32(tz),
                )
            )
            # stepping toward a missing edge must be blocked by occupancy
            assert not occ_ok or radius_ok, "occupancy more permissive"
            if radius_ok and not occ_ok:
                found += 1
    assert found > 0, "no corner-cutting case exercised"


def test_viewpoint_success(world):
    """STOP near a goal view point counts as success even away from the
    goal node itself (SemanticAudioGoal.view_points)."""
    assets, scene = world
    episodes = make_episode_bank(assets, 8, seed=53, min_geodesic_hops=3)
    # graft a viewpoint far from the goal: the agent's own start node
    vps = np.full((8, 2), -1, np.int32)
    vps[:, 0] = np.asarray(episodes.goal_node)
    vps[:, 1] = np.asarray(episodes.start_node)
    episodes = episodes.replace(viewpoint_nodes=jnp.asarray(vps))
    cfg = ContinuousConfig(sensors=("spectrogram",), max_episode_steps=50,
                           episode_sampling="sequential")
    env = ContinuousAudioNavEnv(cfg, scene, episodes, 2)
    state, obs = env.reset(jax.random.PRNGKey(9))
    # immediately STOP at the start node == a view point -> success
    state, obs, r, d, info = env.step(state, jnp.full((2,), STOP))
    assert np.asarray(d).all()
    assert (np.asarray(info["success"]) == 1.0).all()
