"""End-to-end semantics of the functional AudioGoal environment against the
reference's simulator/task/RL-env behavior (simulator.py:478-546,
environments.py:74-101, nav.py measures)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundspaces_tpu import refimpl
from soundspaces_tpu.env import (
    AudioNavEnv,
    DeviceScene,
    EnvConfig,
    make_episode_bank,
)
from soundspaces_tpu.scene import make_synthetic_assets
from soundspaces_tpu.scene.graph import MOVE_FORWARD, STOP, TURN_LEFT


@pytest.fixture(scope="module")
def setup():
    assets = make_synthetic_assets(
        num_nodes_hint=40, sampling_rate=4000, rir_max_len=1500, image_size=16,
        num_sounds=2, max_secs=2, seed=3,
    )
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(assets, num_episodes=32, seed=4, min_geodesic_hops=2)
    return assets, scene, episodes


def make_env(setup, n_envs=4, **cfg_kw):
    assets, scene, episodes = setup
    cfg = EnvConfig(
        sensors=("spectrogram", "audiogoal", "depth", "collision", "pose",
                 "category", "pointgoal_with_gps_compass", "oracle_action"),
        **cfg_kw,
    )
    return assets, AudioNavEnv(cfg, scene, episodes, n_envs)


def test_reset_shapes(setup):
    _, env = make_env(setup)
    state, obs = env.reset(jax.random.PRNGKey(0))
    for name, shape in env.observation_shapes.items():
        assert obs[name].shape == (4,) + shape, name
    assert obs["spectrogram"].shape == (4, 65, 7, 2)  # 4 kHz -> 26 frames /4
    assert state.node.shape == (4,)


def test_audiogoal_matches_reference_pipeline(setup):
    """The env's audio observation must equal the reference's scipy pipeline
    computed from the same RIR + source + indices."""
    assets, env = make_env(setup, n_envs=2)
    ac = assets.acoustics
    state, obs = env.reset(jax.random.PRNGKey(1))

    i = 0
    node = int(state.node[i]); rot = int(state.rot_idx[i])
    slot = int(state.goal_slot[i]); snd = int(state.sound_id[i])
    aidx = int(state.audio_index[i])
    az = (4 - rot) % 4
    rir = np.asarray(ac.rir[az, node, slot])  # [2, L]
    src = np.asarray(ac.sounds[snd][: int(ac.sound_lengths_sec[snd]) * ac.sampling_rate])
    want = refimpl.sliding_window_audiogoal(src, rir.T, aidx, ac.sampling_rate)
    got = np.asarray(obs["audiogoal"][i])
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)

    want_spec = refimpl.compute_spectrogram(want)
    np.testing.assert_allclose(
        np.asarray(obs["spectrogram"][i]), want_spec, rtol=2e-3, atol=2e-3
    )


def test_turns_and_forward_dynamics(setup):
    assets, env = make_env(setup, n_envs=2)
    g = assets.graph
    state, _ = env.reset(jax.random.PRNGKey(2))
    rot0 = np.asarray(state.rot_idx)
    state1, _, _, done, _ = env.step(state, jnp.full((2,), TURN_LEFT))
    assert not bool(np.any(done))
    np.testing.assert_array_equal(np.asarray(state1.rot_idx), (rot0 + 1) % 4)

    node1 = np.asarray(state1.node)
    rot1 = np.asarray(state1.rot_idx)
    state2, obs2, _, _, _ = env.step(state1, jnp.full((2,), MOVE_FORWARD))
    for i in range(2):
        expect = g.forward_neighbor[node1[i], rot1[i]]
        if expect >= 0:
            assert int(state2.node[i]) == expect
            assert float(obs2["collision"][i][0]) == 0.0
        else:
            assert int(state2.node[i]) == node1[i]
            assert float(obs2["collision"][i][0]) == 1.0


def test_oracle_agent_succeeds_with_spl_one(setup):
    """Following the oracle-action sensor must reach the goal with SPL == 1
    and SNA == 1 (the defining property of the shortest-path follower,
    soundspaces/tasks/shortest_path_follower.py)."""
    assets, env = make_env(setup, n_envs=3)
    state, obs = env.reset(jax.random.PRNGKey(3))
    finished = np.zeros(3, bool)
    for t in range(200):
        actions = jnp.asarray(np.asarray(obs["oracle_action"])[:, 0], jnp.int32)
        state, obs, reward, done, info = env.step(state, actions)
        d = np.asarray(done)
        for i in range(3):
            if d[i] and not finished[i]:
                finished[i] = True
                assert float(info["success"][i]) == 1.0
                assert float(info["spl"][i]) == pytest.approx(1.0, abs=1e-5)
                assert float(info["sna"][i]) == pytest.approx(1.0, abs=1e-5)
                assert float(info["distance_to_goal"][i]) == 0.0
        if finished.all():
            break
    assert finished.all()


def test_reward_shaping(setup):
    """slack + distance delta + success bonus (environments.py:74-91)."""
    assets, env = make_env(setup, n_envs=2)
    state, obs = env.reset(jax.random.PRNGKey(5))
    # a TURN changes no distance: reward == slack
    state1, _, reward, _, _ = env.step(state, jnp.full((2,), TURN_LEFT))
    np.testing.assert_allclose(np.asarray(reward), -0.01, atol=1e-6)
    # stopping at the goal pays success_reward + slack
    goal_state = state1.replace(node=state1.goal_node,
                                prev_geodesic=jnp.zeros(2, jnp.float32))
    _, _, reward2, done2, info2 = env.step(goal_state, jnp.full((2,), STOP))
    np.testing.assert_allclose(np.asarray(reward2), 10.0 - 0.01, atol=1e-5)
    assert bool(np.all(np.asarray(done2)))
    np.testing.assert_allclose(np.asarray(info2["success"]), 1.0)


def test_autoreset_on_done(setup):
    assets, env = make_env(setup, n_envs=2)
    state, _ = env.reset(jax.random.PRNGKey(6))
    state1, obs1, _, done, _ = env.step(state, jnp.full((2,), STOP))
    assert bool(np.all(np.asarray(done)))
    assert np.all(np.asarray(state1.step_count) == 0)
    assert np.all(np.asarray(state1.num_actions) == 0)
    # new episode obs is live (non-zero spectrogram for audible sources)
    assert float(np.abs(np.asarray(obs1["spectrogram"])).sum()) > 0


def test_max_episode_steps_truncates(setup):
    assets, env = make_env(setup, n_envs=1, max_episode_steps=5)
    state, _ = env.reset(jax.random.PRNGKey(7))
    done_at = None
    for t in range(1, 8):
        state, _, _, done, info = env.step(state, jnp.full((1,), TURN_LEFT))
        if bool(done[0]):
            done_at = t
            assert float(info["success"][0]) == 0.0
            break
    assert done_at == 5


def test_sequential_episode_iteration(setup):
    assets, scene, episodes = setup
    cfg = EnvConfig(sensors=("spectrogram",), episode_sampling="sequential")
    env = AudioNavEnv(cfg, scene, episodes, num_envs=2)
    state, _ = env.reset(jax.random.PRNGKey(8))
    # envs 0/1 start at episodes 0/1
    np.testing.assert_array_equal(
        np.asarray(state.start_node), np.asarray(episodes.start_node[:2])
    )
    state1, *_ = env.step(state, jnp.full((2,), STOP))
    # after done, envs advance by stride num_envs -> episodes 2/3
    np.testing.assert_array_equal(
        np.asarray(state1.start_node), np.asarray(episodes.start_node[2:4])
    )


def test_move_all_action_space(setup):
    """'move-all' (MoveOnlySpaceConfiguration): STOP + 4 translations, no
    turns; strafes move to the neighbor at ±90° without rotating
    (soundspaces/tasks/action_space.py:12-46)."""
    assets, scene, episodes = setup
    env = AudioNavEnv(
        EnvConfig(sensors=("spectrogram",), action_space="move-all"),
        scene, episodes, 2,
    )
    assert env.config.num_actions == 5
    g = assets.graph
    state, _ = env.reset(jax.random.PRNGKey(7))
    node0 = np.asarray(state.node)
    rot0 = np.asarray(state.rot_idx)
    # local ids: 0 STOP, 1 FORWARD, 2 BACKWARD, 3 RIGHT, 4 LEFT
    for local, ddir in ((1, 0), (2, 2), (3, -1), (4, 1)):
        s1, o1, _, done, _ = env.step(state, jnp.full((2,), local))
        assert not np.any(np.asarray(done))
        np.testing.assert_array_equal(np.asarray(s1.rot_idx), rot0)  # no turn
        for i in range(2):
            expect = g.forward_neighbor[node0[i], (rot0[i] + ddir) % 4]
            got = int(np.asarray(s1.node)[i])
            if expect >= 0:
                assert got == expect, (local, ddir)
            else:
                assert got == node0[i]  # blocked strafe: stay put
    # STOP ends the episode
    s2, _, _, done, _ = env.step(state, jnp.zeros(2, jnp.int32))
    assert np.all(np.asarray(done))


def test_continuous_view_change_intermediates(setup):
    """CONTINUOUS_VIEW_CHANGE (simulator.py:518-545): fps-1 intermediate
    frames blending previous -> new pose."""
    assets, scene, episodes = setup
    env = AudioNavEnv(
        EnvConfig(sensors=("spectrogram", "depth"),
                  continuous_view_change=True, view_change_fps=5),
        scene, episodes, 2,
    )
    state, obs0 = env.reset(jax.random.PRNGKey(9))
    assert obs0["intermediate_depth"].shape[:2] == (2, 4)
    s1, obs1, _, done, _ = env.step(state, jnp.full((2,), MOVE_FORWARD))
    mid = np.asarray(obs1["intermediate_depth"])
    f0 = np.asarray(scene.frames["depth"])[
        np.asarray(state.node), np.asarray(state.rot_idx)
    ]
    f1 = np.asarray(scene.frames["depth"])[
        np.asarray(s1.node), np.asarray(s1.rot_idx)
    ]
    for i in range(2):
        want = f0[i] + (1.0 / 5.0) * (f1[i] - f0[i])
        np.testing.assert_allclose(mid[i, 0], want, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            mid[i, -1], f0[i] + 0.8 * (f1[i] - f0[i]), rtol=1e-5, atol=1e-6
        )


def test_step_chunks_equivalent(setup):
    """step_chunks processes the batch in lax.map chunks — bitwise-identical
    observations and state to the unchunked vmap (a pure locality split)."""
    assets, scene, episodes = setup
    env1 = AudioNavEnv(EnvConfig(sensors=("spectrogram",)), scene, episodes, 4)
    env2 = AudioNavEnv(
        EnvConfig(sensors=("spectrogram",), step_chunks=2), scene, episodes, 4
    )
    s1, o1 = env1.reset(jax.random.PRNGKey(3))
    s2, o2 = env2.reset(jax.random.PRNGKey(3))
    for _ in range(3):
        a = jnp.array([1, 2, 1, 3])
        s1, o1, r1, d1, i1 = env1.step(s1, a)
        s2, o2, r2, d2, i2 = env2.step(s2, a)
        np.testing.assert_array_equal(np.asarray(s1.node), np.asarray(s2.node))
        np.testing.assert_allclose(
            np.asarray(o1["spectrogram"]), np.asarray(o2["spectrogram"]),
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2))


def test_collisions_measure(setup):
    """Per-episode collision count (habitat's Collisions measure referenced
    by the eval configs): increments on blocked MOVE_FORWARD, resets with
    the episode."""
    import jax
    import jax.numpy as jnp

    _, env = make_env(setup, n_envs=4)
    state, _ = env.reset(jax.random.PRNGKey(3))
    total = np.zeros(env.num_envs, np.float32)
    hit = False
    for _ in range(25):
        state, _, _, done, info = env.step(
            state, jnp.full((env.num_envs,), MOVE_FORWARD)
        )
        c = np.asarray(info["collisions"])
        d = np.asarray(done)
        assert (c >= 0).all()
        if (c > 0).any():
            hit = True
        total = np.where(d, 0.0, c)
    assert hit  # forward-only walking must hit a wall somewhere
    # count never exceeds steps taken
    assert (np.asarray(state.collision_count) <= 25).all()
