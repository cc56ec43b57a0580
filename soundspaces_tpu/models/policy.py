"""Actor-critic policies.

The reference's Policy wraps a Net producing (features, hidden) and heads
CategoricalNet + CriticHead with act/get_value/evaluate_actions
(ss_baselines/av_nav/ppo/policy.py:22-218). Here the same surface is a flax
module with three apply methods; sampling uses explicit PRNG keys and the
whole act path jits into the environment rollout scan.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from soundspaces_tpu.models.encoders import AudioCNN, VisualCNN
from soundspaces_tpu.models.rnn_state_encoder import RNNStateEncoder

_ORTHO_GAIN_001 = nn.initializers.orthogonal(0.01)


class AudioNavBaselineNet(nn.Module):
    """AV-Nav fusion net: AudioCNN(spectrogram) ⊕ VisualCNN(rgb/depth)
    [⊕ pointgoal] -> GRU (ss_baselines/av_nav/ppo/policy.py:137-218)."""

    hidden_size: int = 512
    use_visual: bool = True
    use_audio: bool = True
    use_pointgoal: bool = False
    audio_sensor: str = "spectrogram"
    visual_encoder: str = "simple"  # or "resnet18"/"resnet50" (DD-PPO style)

    @nn.compact
    def __call__(self, observations, hidden, masks):
        """observations: dict of [T, B, ...] or [B, ...] arrays."""
        ref_name = self.audio_sensor if self.use_audio else "depth"
        ref = observations.get(ref_name, observations.get("rgb"))
        seq = ref.ndim == 5  # [T, B, H, W, C] vs [B, H, W, C]

        def encode(obs):
            feats = []
            if self.use_audio and self.audio_sensor in obs:
                feats.append(AudioCNN(self.hidden_size, self.audio_sensor)(obs))
            # is_blind handling (av_nav/models/visual_cnn.py:88-90): skip the
            # visual stack when the obs suite carries no visual modality
            if self.use_visual and ("rgb" in obs or "depth" in obs):
                if self.visual_encoder == "simple":
                    feats.append(VisualCNN(self.hidden_size)(obs))
                else:
                    from soundspaces_tpu.models.resnet import ResNetVisualEncoder

                    feats.append(
                        ResNetVisualEncoder(
                            self.hidden_size, self.visual_encoder
                        )(obs)
                    )
            if self.use_pointgoal:
                feats.append(obs["pointgoal_with_gps_compass"])
            return jnp.concatenate(feats, axis=-1)

        if seq:
            t, b = ref.shape[:2]
            flat = jax.tree.map(
                lambda o: o.reshape((t * b,) + o.shape[2:]), observations
            )
            x = encode(flat).reshape(t, b, -1)
        else:
            x = encode(observations)
        return RNNStateEncoder(self.hidden_size)(x, hidden, masks)


class CategoricalPolicy(nn.Module):
    """Discrete-action actor-critic over any feature net.

    Methods mirror the reference Policy surface: `act` (sample + value +
    log-prob), `get_value`, and `evaluate_actions` (log-probs, entropy,
    value for PPO updates). An optional action mask reproduces
    CategoricalNetWithMask for AV-WaN waypoint policies
    (ss_baselines/common/utils.py:58-87)."""

    net: nn.Module
    num_actions: int = 4

    def setup(self):
        self.action_head = nn.Dense(self.num_actions, kernel_init=_ORTHO_GAIN_001)
        self.critic = nn.Dense(1, kernel_init=nn.initializers.orthogonal())

    def _logits_value(self, observations, hidden, masks, action_mask=None):
        features, hidden = self.net(observations, hidden, masks)
        logits = self.action_head(features)
        if action_mask is not None:
            logits = jnp.where(action_mask > 0, logits, -1e9)
        value = self.critic(features)[..., 0]
        return logits, value, hidden

    def act(self, observations, hidden, masks, rng, deterministic=False,
            action_mask=None):
        logits, value, hidden = self._logits_value(
            observations, hidden, masks, action_mask
        )
        if deterministic:
            action = jnp.argmax(logits, axis=-1)
        else:
            action = jax.random.categorical(rng, logits, axis=-1)
        logp = jax.nn.log_softmax(logits)
        action_log_prob = jnp.take_along_axis(logp, action[..., None], -1)[..., 0]
        return action, action_log_prob, value, hidden

    def get_value(self, observations, hidden, masks, action_mask=None):
        _, value, _ = self._logits_value(observations, hidden, masks, action_mask)
        return value

    def evaluate_actions(self, observations, hidden, masks, actions,
                         action_mask=None):
        logits, value, hidden = self._logits_value(
            observations, hidden, masks, action_mask
        )
        logp = jax.nn.log_softmax(logits)
        action_log_probs = jnp.take_along_axis(logp, actions[..., None], -1)[..., 0]
        probs = jax.nn.softmax(logits)
        entropy = -(probs * logp).sum(-1)
        return action_log_probs, entropy, value, hidden

    def distribution(self, observations, hidden, masks, action_mask=None):
        """Full action log-probabilities (+ value) — consumed by losses
        that marginalize over an acceptable-action SET rather than a
        single label (the AV-WaN DAgger warm-start's marginal CE,
        avwan/trainer.py)."""
        logits, value, hidden = self._logits_value(
            observations, hidden, masks, action_mask
        )
        return jax.nn.log_softmax(logits), value, hidden

    def __call__(self, observations, hidden, masks):
        # default apply path (used for init)
        return self._logits_value(observations, hidden, masks)
