"""SAVi components: external memory semantics, SMT attention, policy
act/evaluate consistency, belief predictor learning."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundspaces_tpu.savi import (
    AudioNavSMTNet,
    BeliefPredictor,
    ExternalMemory,
    SMTPolicy,
)
from soundspaces_tpu.savi.policy import SMTPolicyState, smt_initial_state
from soundspaces_tpu.savi.smt import format_pose, relative_pose


def test_external_memory_ring_and_reset():
    mem = ExternalMemory.zeros(2, capacity=3, dim=2)
    f = lambda v: jnp.full((2, 2), float(v))
    mem = mem.insert(f(1), jnp.ones(2))
    mem = mem.insert(f(2), jnp.ones(2))
    assert np.asarray(mem.masks).tolist() == [[1, 1, 0], [1, 1, 0]]
    # env 1 episode ends: its memory resets before the write
    mem = mem.insert(f(3), jnp.asarray([1.0, 0.0]))
    assert np.asarray(mem.masks[0]).tolist() == [1, 1, 1]
    assert np.asarray(mem.masks[1]).tolist() == [0, 0, 1]
    # capacity eviction: 4th insert overwrites slot 0
    mem = mem.insert(f(4), jnp.ones(2))
    assert float(mem.buffer[0, 0, 0]) == 4.0


def test_relative_pose_math():
    # agent at (1, 0) heading 0; target at (2, 1) -> forward 1, sideways 1
    a = jnp.asarray([[1.0, 0.0, 0.0]])
    b = jnp.asarray([[2.0, 1.0, 0.0]])
    rel = np.asarray(relative_pose(a, b))[0]
    assert rel[0] == pytest.approx(1.0, abs=1e-5)
    assert abs(rel[1]) == pytest.approx(1.0, abs=1e-5)
    # formatting embeds heading as cos/sin and time as exp(-t)
    fp = np.asarray(format_pose(jnp.asarray([[1.0, 2.0, 0.0, 0.0]])))[0]
    np.testing.assert_allclose(fp, [1.0, 2.0, 1.0, 0.0, 1.0], atol=1e-6)


def obs_batch(n=2, t=None, rng=None):
    rng = rng or np.random.default_rng(0)
    shape = lambda *s: ((t, n) + s) if t else ((n,) + s)
    return {
        "spectrogram": rng.standard_normal(shape(65, 26, 2)).astype(np.float32),
        "depth": rng.random(shape(64, 64, 1)).astype(np.float32),
        "pose": rng.standard_normal(shape(4)).astype(np.float32),
        "category": np.eye(21, dtype=np.float32)[rng.integers(0, 21, (t, n) if t else n)],
    }


@pytest.fixture(scope="module")
def smt_policy():
    net = AudioNavSMTNet(hidden_size=64, nhead=4)
    policy = SMTPolicy(net=net, num_actions=4)
    obs = obs_batch()
    state = smt_initial_state(2, capacity=5, feature_dim=64 + 16 + 128 + 4)
    params = policy.init(
        jax.random.PRNGKey(0), obs, state, jnp.ones(2), jax.random.PRNGKey(1),
        method=policy.act,
    )
    return policy, params, state


def test_smt_act_shapes_and_memory_growth(smt_policy):
    policy, params, state = smt_policy
    obs = obs_batch()
    action, logp, value, state1 = policy.apply(
        params, obs, state, jnp.ones(2), jax.random.PRNGKey(2),
        method=policy.act,
    )
    assert action.shape == (2,) and value.shape == (2,)
    assert float(state1.memory.masks.sum()) == 2.0  # one entry per env
    np.testing.assert_array_equal(np.asarray(state1.prev_action), np.asarray(action))


def test_smt_evaluate_matches_act_replay(smt_policy):
    """evaluate_actions must reproduce the exact per-step distributions the
    act path saw (same memory evolution)."""
    policy, params, state0 = smt_policy
    T, N = 4, 2
    rng = np.random.default_rng(3)
    obs_seq = obs_batch(n=N, t=T, rng=rng)
    dones = jnp.asarray((rng.random((T, N)) < 0.3).astype(np.float32))

    # act path, step by step
    state = state0
    logps, actions = [], []
    for t in range(T):
        obs_t = jax.tree.map(lambda o: o[t], obs_seq)
        a, lp, v, state = policy.apply(
            params, obs_t, state, 1.0 - dones[t], jax.random.PRNGKey(10 + t),
            method=policy.act,
        )
        actions.append(a)
        logps.append(lp)
    actions = jnp.stack(actions)

    alp, entropy, values = policy.apply(
        params, obs_seq, state0, dones, actions,
        method=policy.evaluate_actions,
    )
    np.testing.assert_allclose(
        np.asarray(alp), np.asarray(jnp.stack(logps)), rtol=1e-4, atol=1e-5
    )
    assert np.all(np.asarray(entropy) > 0)


def test_memory_reset_changes_attention(smt_policy):
    """After an episode boundary the memory must not leak: acting with
    not_done=0 should equal acting from a fresh memory."""
    policy, params, state0 = smt_policy
    obs = obs_batch()
    # build up some memory
    state = state0
    for t in range(3):
        _, _, _, state = policy.apply(
            params, obs, state, jnp.ones(2), jax.random.PRNGKey(t),
            method=policy.act,
        )
    # next step with done: memory invalidated before attention?? No — the
    # reference invalidates at INSERT time, so the attention at the reset
    # step still sees old memory; the step after must not.
    _, _, _, state_reset = policy.apply(
        params, obs, state, jnp.zeros(2), jax.random.PRNGKey(9),
        method=policy.act,
    )
    assert float(state_reset.memory.masks.sum()) == 2.0  # only the new entry

    fresh = smt_initial_state(2, 5, state0.memory.buffer.shape[-1])
    _, _, _, fresh1 = policy.apply(
        params, obs, fresh, jnp.ones(2), jax.random.PRNGKey(9),
        method=policy.act,
    )
    # the sampled action differs between the two paths (different logits at
    # the reset step); pin prev_action so only the memory content matters —
    # stale-but-masked slots and differing ring offsets must not leak
    pin = jnp.zeros(2, jnp.int32)
    v_after_reset = policy.apply(
        params, obs, state_reset.replace(prev_action=pin),
        method=policy.get_value,
    )
    # fresh memory with the same single valid entry content
    fresh1 = fresh1.replace(
        memory=fresh1.memory.replace(
            buffer=fresh1.memory.buffer.at[:, 0].set(
                state_reset.memory.buffer[
                    jnp.arange(2), (state_reset.memory.idx - 1) % 5
                ]
            )
        ),
        prev_action=pin,
    )
    v_fresh = policy.apply(params, obs, fresh1, method=policy.get_value)
    np.testing.assert_allclose(
        np.asarray(v_after_reset), np.asarray(v_fresh), rtol=1e-4, atol=1e-5
    )


def test_belief_predictor_learns(rng):
    bp = BeliefPredictor(num_categories=5)
    spec = rng.standard_normal((16, 65, 26, 2)).astype(np.float32)
    gt_loc = rng.standard_normal((16, 2)).astype(np.float32)
    gt_cat = rng.integers(0, 5, 16)
    params, opt_state = bp.init(jax.random.PRNGKey(0), spec)
    update = jax.jit(bp.update)
    first = None
    for i in range(40):
        params, opt_state, aux = update(
            params, opt_state, spec, gt_loc, gt_cat, np.ones(16)
        )
        if first is None:
            first = float(aux["belief_mse"] + aux["belief_ce"])
    last = float(aux["belief_mse"] + aux["belief_ce"])
    assert last < first * 0.8, (first, last)


def test_belief_smoothing_transform():
    prev = jnp.asarray([[1.0, 0.0]])  # goal 1 m ahead (x forward)
    # agent moved 1 m forward, no rotation: goal should now be at origin
    delta = jnp.asarray([[1.0, 0.0, 0.0]])
    out = BeliefPredictor.smooth_location(prev, jnp.zeros((1, 2)), delta, weight=1.0)
    np.testing.assert_allclose(np.asarray(out), [[0.0, 0.0]], atol=1e-6)
    # first step: use fresh prediction only
    out2 = BeliefPredictor.smooth_location(
        prev, jnp.asarray([[5.0, 5.0]]), delta, weight=1.0,
        first_step=jnp.asarray([True]),
    )
    np.testing.assert_allclose(np.asarray(out2), [[5.0, 5.0]], atol=1e-6)


def test_smtcnn_consumes_semantic_index_map():
    """SMTCNN colorizes the semantic_object index map [B, H, W] into
    channels (the reference's 6-ch semantic stack, savi/models/smt_cnn.py)."""
    import jax
    import jax.numpy as jnp

    from soundspaces_tpu.savi.policy import SMTCNN

    enc = SMTCNN(feature_dim=16)
    obs = {
        "depth": jnp.ones((2, 16, 16, 1), jnp.float32),
        "semantic_object": jnp.full((2, 16, 16), 3, jnp.int32),
    }
    params = enc.init(jax.random.PRNGKey(0), obs)
    out = enc.apply(params, obs)
    assert out.shape == (2, 32)  # two modalities x feature_dim
    assert bool(jnp.isfinite(out).all())


def test_category_decoupled_from_sound():
    """Synthetic episode banks must not alias category 1:1 to sound id:
    categories belong to goal objects and several sound clips voice each
    category (VERDICT round-1 item #7)."""
    import numpy as np

    from soundspaces_tpu.env import make_episode_bank
    from soundspaces_tpu.scene import make_synthetic_assets

    assets = make_synthetic_assets(
        num_nodes_hint=40, sampling_rate=2000, rir_max_len=400,
        num_sounds=8, num_goals=4, max_secs=1, seed=9,
    )
    assert assets.node_category is not None
    bank = make_episode_bank(assets, 256, seed=10)
    cats = np.asarray(bank.category)
    sounds = np.asarray(bank.sound_id)
    goals = np.asarray(bank.goal_node)
    # category is the goal object's category
    np.testing.assert_array_equal(cats, assets.node_category[goals])
    # many-to-one: more distinct clips than categories in play
    assert len(np.unique(sounds)) > len(np.unique(cats))
    # at least one category voiced by 2+ different clips
    per_cat_clips = {
        c: np.unique(sounds[cats == c]).size for c in np.unique(cats)
    }
    assert max(per_cat_clips.values()) >= 2, per_cat_clips


def test_belief_ablation_zeroes_policy_inputs():
    from soundspaces_tpu.savi.trainer import SAViConfig, SAViTrainer
    from soundspaces_tpu.env import AudioNavEnv, DeviceScene, make_episode_bank
    from soundspaces_tpu.env.structs import EnvConfig
    from soundspaces_tpu.scene import make_synthetic_assets
    from soundspaces_tpu.train.ppo import PPOConfig
    import numpy as np
    import jax
    import jax.numpy as jnp

    assets = make_synthetic_assets(
        num_nodes_hint=30, sampling_rate=2000, rir_max_len=400,
        num_sounds=4, max_secs=1, seed=11,
    )
    scene = DeviceScene.from_assets(assets)
    eps = make_episode_bank(assets, 8, seed=12)
    env = AudioNavEnv(EnvConfig(sensors=("spectrogram", "pose", "category")),
                      scene, eps, 2)
    tr = SAViTrainer(env, PPOConfig(num_steps=2, hidden_size=32),
                     SAViConfig(memory_size=8, hidden_size=32,
                                ablate_beliefs=True))
    _, obs = env.reset(jax.random.PRNGKey(0))
    bparams, _ = tr.belief.init(jax.random.PRNGKey(1), obs["spectrogram"])
    obs_b = tr._with_beliefs(bparams, obs, jnp.ones((2, 2)))
    assert float(np.abs(np.asarray(obs_b["location_belief"])).max()) == 0.0
    assert float(np.abs(np.asarray(obs_b["category_belief"])).max()) == 0.0


def test_location_belief_odometry_smoothing():
    """smooth_location: the previous estimate is transported through the
    agent's motion before averaging (belief_predictor.py:136-202,
    base_to_odom/odom_to_base 210-226)."""
    import numpy as np
    import jax.numpy as jnp

    from soundspaces_tpu.savi.belief import BeliefPredictor

    prev = jnp.asarray([[2.0, 0.0]])  # goal 2 m ahead in the old frame
    fresh = jnp.asarray([[1.0, 0.0]])
    # agent moved 1 m forward, no rotation: prev-in-new = (1, 0) -> mix = 1
    delta = jnp.asarray([[1.0, 0.0, 0.0]])
    out = BeliefPredictor.smooth_location(prev, fresh, delta, weight=0.5)
    np.testing.assert_allclose(np.asarray(out), [[1.0, 0.0]], atol=1e-6)
    # pure 90-degree left turn: (2, 0) ahead becomes (0, -2) in the new
    # frame (rotation by -dh)
    delta = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    out = BeliefPredictor.smooth_location(prev, fresh, delta, weight=1.0)
    np.testing.assert_allclose(np.asarray(out), [[0.0, -2.0]], atol=1e-6)
    # first step takes the fresh prediction outright
    out = BeliefPredictor.smooth_location(
        prev, fresh, delta, weight=1.0, first_step=jnp.asarray([True])
    )
    np.testing.assert_allclose(np.asarray(out), [[1.0, 0.0]], atol=1e-6)
