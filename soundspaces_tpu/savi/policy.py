"""SAVi policy: SMT over external memory with belief-vector goal queries.

Reference: AudioNavSMTNet / AudioNavSMTPolicy
(ss_baselines/savi/ppo/policy.py:285-451): per-step feature =
SMTCNN(visual) ++ action-embedding(16) ++ AudioCNN(spectrogram, 128) ++ pose;
the SMT attends over the external memory with the belief vector
(21-dim category + 2-dim location, zero-padded to the hidden size) as the
decoder query.

The PPO-update path replays the rollout with a `lax.scan` that rebuilds the
per-step memory from the stored feature history — equivalent to the
reference's T+1 memory snapshots (savi/models/rollout_storage.py:77-81)
without materializing them. (The fully-batched banded-attention form is the
planned kernel upgrade; pose re-encoding makes keys query-dependent, so it
trades memory for one big attention.)"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from soundspaces_tpu.models.encoders import AudioCNN, _ConvStack
from soundspaces_tpu.savi.memory import ExternalMemory
from soundspaces_tpu.savi.smt import SMTStateEncoder

_ORTHO_001 = nn.initializers.orthogonal(0.01)


class SMTCNN(nn.Module):
    """Per-modality visual encoders -> 64-d each (the reference uses a
    GroupNorm resnet18 per modality, savi/models/smt_cnn.py:17-141; this is
    a capacity-comparable conv stack on 64x64 center crops)."""

    feature_dim: int = 64

    @nn.compact
    def __call__(self, observations):
        feats = []
        for name in ("rgb", "depth", "semantic_object"):
            if name not in observations:
                continue
            x = observations[name]
            if name == "rgb":
                x = x.astype(jnp.float32) / 255.0
            elif name == "semantic_object" and x.ndim == 3:
                # index map [B, H, W] -> channels: palette RGB + normalized
                # task id (the reference feeds a 6-ch semantic-RGB +
                # semantic-object stack, savi/models/smt_cnn.py)
                from soundspaces_tpu.scene.mp3d import (
                    NUM_TASK_CATEGORIES,
                    semantic_palette,
                )

                pal = jnp.asarray(semantic_palette(), jnp.float32) / 255.0
                idx = x.astype(jnp.int32)
                x = jnp.concatenate(
                    [
                        pal[idx],
                        (idx.astype(jnp.float32) / NUM_TASK_CATEGORIES)[
                            ..., None
                        ],
                    ],
                    axis=-1,
                )
            x = _resize_center_crop(x, 64)
            feats.append(
                _ConvStack(
                    kernels=((5, 5), (3, 3), (3, 3)),
                    strides=((2, 2), (2, 2), (2, 2)),
                    output_size=self.feature_dim,
                )(x)
            )
        return jnp.concatenate(feats, axis=-1)


def _resize_center_crop(x: jax.Array, size: int) -> jax.Array:
    """The reference's ResizeCenterCropper(64x64)
    (ss_baselines/common/utils.py:341-386)."""
    h, w = x.shape[1], x.shape[2]
    scale = size / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    x = jax.image.resize(x, (x.shape[0], nh, nw, x.shape[-1]), "bilinear")
    top, left = (nh - size) // 2, (nw - size) // 2
    return x[:, top : top + size, left : left + size, :]


class AudioNavSMTNet(nn.Module):
    """Step features + SMT attention. Pose occupies the trailing 4 dims of
    the feature vector (pose_indices bookkeeping, policy.py:334-343)."""

    hidden_size: int = 256
    nhead: int = 8
    num_actions: int = 4
    use_belief_as_goal: bool = True
    num_categories: int = 21

    def setup(self):
        self.goal_encoder = AudioCNN(128, "spectrogram")
        self.visual_encoder = SMTCNN()
        self.action_encoder = nn.Dense(16)
        self.smt = SMTStateEncoder(
            dim=self.hidden_size, nhead=self.nhead, pose_dims=4
        )

    def get_features(self, observations, prev_actions) -> jax.Array:
        """[N, F] fused step embedding (policy.py:439-451)."""
        one_hot = jax.nn.one_hot(prev_actions, self.num_actions)
        parts = [
            self.visual_encoder(observations),
            self.action_encoder(one_hot),
            self.goal_encoder(observations),
            observations["pose"],
        ]
        return jnp.concatenate(parts, axis=-1)

    def goal_vector(self, observations) -> jax.Array | None:
        if not self.use_belief_as_goal:
            return None
        n = observations["pose"].shape[0]
        belief = jnp.zeros((n, self.hidden_size))
        if "category_belief" in observations:
            belief = belief.at[:, : self.num_categories].set(
                observations["category_belief"]
            )
        elif "category" in observations:
            belief = belief.at[:, : self.num_categories].set(
                observations["category"]
            )
        if "location_belief" in observations:
            belief = belief.at[:, self.num_categories : self.num_categories + 2].set(
                observations["location_belief"]
            )
        return belief

    def __call__(self, observations, prev_actions, memory: ExternalMemory):
        x = self.get_features(observations, prev_actions)
        goal = self.goal_vector(observations)
        att = self.smt(x, memory.buffer, memory.masks, goal=goal)
        return att, x


@struct.dataclass
class SMTPolicyState:
    """Recurrent state of the SMT policy: the external memory plus the
    previous action (fed back as an input embedding)."""

    memory: ExternalMemory
    prev_action: jax.Array  # [N] int32


class SMTPolicy(nn.Module):
    """act / evaluate_actions surface over AudioNavSMTNet
    (savi/ppo/policy.py:42-93)."""

    net: AudioNavSMTNet
    num_actions: int = 4

    def setup(self):
        self.action_head = nn.Dense(self.num_actions, kernel_init=_ORTHO_001)
        self.critic = nn.Dense(1, kernel_init=nn.initializers.orthogonal())

    def _heads(self, att):
        return self.action_head(att), self.critic(att)[..., 0]

    def act(self, observations, state: SMTPolicyState, not_done, rng,
            deterministic=False):
        """Returns (action, log_prob, value, new_state). `not_done`: [N]
        1.0 while the episode continues (resets the memory)."""
        att, x = self.net(observations, state.prev_action, state.memory)
        logits, value = self._heads(att)
        if deterministic:
            action = jnp.argmax(logits, -1)
        else:
            action = jax.random.categorical(rng, logits, -1)
        logp = jax.nn.log_softmax(logits)
        alp = jnp.take_along_axis(logp, action[..., None], -1)[..., 0]
        memory = state.memory.insert(x, not_done)
        return action, alp, value, SMTPolicyState(memory=memory, prev_action=action)

    def get_value(self, observations, state: SMTPolicyState):
        att, _ = self.net(observations, state.prev_action, state.memory)
        return self._heads(att)[1]

    def evaluate_actions(
        self,
        observations,  # dict of [T, N, ...]
        initial_state: SMTPolicyState,
        dones,  # [T, N] float/bool: episode ended at step t
        actions,  # [T, N]
    ):
        """Replay the rollout, rebuilding each step's memory exactly as the
        act path did."""
        t_len, n = actions.shape

        def step(carry, inp):
            state = carry
            obs_t, act_t, done_t = inp
            att, x = self.net(obs_t, state.prev_action, state.memory)
            logits, value = self._heads(att)
            memory = state.memory.insert(x, 1.0 - done_t.astype(jnp.float32))
            new_state = SMTPolicyState(memory=memory, prev_action=act_t)
            return new_state, (logits, value)

        if self.is_initializing():
            obs0 = jax.tree.map(lambda o: o[0], observations)
            _, (logits, values) = step(
                initial_state, (obs0, actions[0], dones[0])
            )
            logits = jnp.broadcast_to(logits, (t_len,) + logits.shape)
            values = jnp.broadcast_to(values, (t_len,) + values.shape)
        else:
            # Remat PER STEP: differentiating a scan otherwise stacks every
            # step's transformer residuals across T — f32[T, N, heads,
            # mem+1, mem+1] attention alone is 1.75 GB at the realistic
            # recipe (T=150, N=16, mem=150) and OOMed the 16 GB chip.
            # Checkpointing the step body stores only each step's carry
            # (the memory snapshot) and recomputes the attention inside the
            # backward sweep: peak drops ~12 GB for ~1.3x replay FLOPs.
            _, (logits, values) = jax.lax.scan(
                jax.checkpoint(step), initial_state,
                (observations, actions, dones),
            )
        logp = jax.nn.log_softmax(logits)
        alp = jnp.take_along_axis(logp, actions[..., None], -1)[..., 0]
        probs = jax.nn.softmax(logits)
        entropy = -(probs * logp).sum(-1)
        return alp, entropy, values

    def __call__(self, observations, state: SMTPolicyState, not_done, rng):
        return self.act(observations, state, not_done, rng)


def smt_feature_dim(visual_modalities: int) -> int:
    """visual (64 per modality) + action embed 16 + audio 128 + pose 4."""
    return 64 * visual_modalities + 16 + 128 + 4


def smt_initial_state(
    num_envs: int, capacity: int, feature_dim: int
) -> SMTPolicyState:
    return SMTPolicyState(
        memory=ExternalMemory.zeros(num_envs, capacity, feature_dim),
        prev_action=jnp.zeros((num_envs,), jnp.int32),
    )
