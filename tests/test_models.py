"""Model-layer behavior: shapes, mask-resetting recurrence, policy surface."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundspaces_tpu.models import (
    AudioCNN,
    AudioNavBaselineNet,
    CategoricalPolicy,
    RNNStateEncoder,
    VisualCNN,
)


def obs_batch(b=3, t=None):
    rng = np.random.default_rng(0)
    shape = lambda *s: (t, b, *s) if t else (b, *s)
    return {
        "spectrogram": rng.standard_normal(shape(65, 26, 2)).astype(np.float32),
        "depth": rng.random(shape(128, 128, 1)).astype(np.float32),
    }


def test_visual_and_audio_cnn_shapes():
    obs = obs_batch()
    v = VisualCNN(512)
    pv = v.init(jax.random.PRNGKey(0), obs)
    assert v.apply(pv, obs).shape == (3, 512)
    a = AudioCNN(512)
    pa = a.init(jax.random.PRNGKey(0), obs)
    assert a.apply(pa, obs).shape == (3, 512)


def test_rnn_mask_resets_hidden():
    enc = RNNStateEncoder(16)
    x = jnp.ones((4, 8))
    h0 = jnp.zeros((4, 16))
    params = enc.init(jax.random.PRNGKey(0), x, h0, jnp.ones(4))
    _, h1 = enc.apply(params, x, h0, jnp.ones(4))
    # step with mask=0 must equal a step from zero hidden state
    out_masked, _ = enc.apply(params, x, h1, jnp.zeros(4))
    out_fresh, _ = enc.apply(params, x, h0, jnp.ones(4))
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_fresh), atol=1e-6)


def test_rnn_sequence_equals_stepwise():
    """scan-based seq forward == per-step forward with the same masks (the
    property the reference's has_zeros splitting exists to preserve,
    rnn_state_encoder.py:92-143)."""
    enc = RNNStateEncoder(16)
    t, b = 5, 2
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.standard_normal((t, b, 8)), jnp.float32)
    masks = jnp.asarray((rng.random((t, b)) > 0.3).astype(np.float32))
    h0 = jnp.zeros((b, 16))
    params = enc.init(jax.random.PRNGKey(0), xs[0], h0, masks[0])

    seq_out, seq_h = enc.apply(params, xs, h0, masks)
    h = h0
    for i in range(t):
        out, h = enc.apply(params, xs[i], h, masks[i])
        np.testing.assert_allclose(np.asarray(seq_out[i]), np.asarray(out), atol=1e-5)
    np.testing.assert_allclose(np.asarray(seq_h), np.asarray(h), atol=1e-5)


@pytest.fixture(scope="module")
def policy_and_params():
    net = AudioNavBaselineNet(hidden_size=64)
    policy = CategoricalPolicy(net=net, num_actions=4)
    obs = obs_batch()
    h0 = jnp.zeros((3, 64))
    params = policy.init(jax.random.PRNGKey(0), obs, h0, jnp.ones(3))
    return policy, params, obs, h0


def test_policy_act_and_value(policy_and_params):
    policy, params, obs, h0 = policy_and_params
    action, logp, value, h1 = policy.apply(
        params, obs, h0, jnp.ones(3), jax.random.PRNGKey(1), method=policy.act
    )
    assert action.shape == (3,) and value.shape == (3,)
    assert np.all(np.asarray(action) >= 0) and np.all(np.asarray(action) < 4)
    assert np.all(np.asarray(logp) <= 0)
    v = policy.apply(params, obs, h0, jnp.ones(3), method=policy.get_value)
    np.testing.assert_allclose(np.asarray(v), np.asarray(value), atol=1e-6)


def test_policy_evaluate_actions_consistent_with_act(policy_and_params):
    policy, params, obs, h0 = policy_and_params
    action, logp, _, _ = policy.apply(
        params, obs, h0, jnp.ones(3), jax.random.PRNGKey(2), method=policy.act
    )
    logp2, entropy, value, _ = policy.apply(
        params, obs, h0, jnp.ones(3), action, method=policy.evaluate_actions
    )
    np.testing.assert_allclose(np.asarray(logp), np.asarray(logp2), atol=1e-6)
    assert np.all(np.asarray(entropy) > 0)


def test_policy_sequence_forward(policy_and_params):
    policy, params, _, _ = policy_and_params
    obs = obs_batch(b=3, t=4)
    h0 = jnp.zeros((3, 64))
    masks = jnp.ones((4, 3))
    actions = jnp.zeros((4, 3), jnp.int32)
    logp, entropy, value, _ = policy.apply(
        params, obs, h0, masks, actions, method=policy.evaluate_actions
    )
    assert logp.shape == (4, 3) and value.shape == (4, 3)


def test_action_mask_blocks_actions(policy_and_params):
    policy, params, obs, h0 = policy_and_params
    mask = jnp.asarray([[1, 0, 0, 0]] * 3, jnp.float32)
    for seed in range(5):
        action, *_ = policy.apply(
            params, obs, h0, jnp.ones(3), jax.random.PRNGKey(seed), False, mask,
            method=policy.act,
        )
        assert np.all(np.asarray(action) == 0)
