"""Scene Memory Transformer state encoder.

Reference: ss_baselines/savi/models/smt_state_encoder.py:15-249 — a torch
nn.Transformer (1 encoder + 1 decoder layer, post-norm) attending over the
external memory plus the current step, with key-padding masks and
relative-pose re-encoding: memory poses are re-expressed in the current
agent frame each step and embedded as (x, y, cos h, sin h, e^{-t}) -> 16-d
(smt_state_encoder.py:179-245).

Implemented with flax attention primitives; masks come in as floats
(1 = valid) and convert to additive -inf bias. The same module serves both
the act path (memory = ring buffer [N, M, dim]) and the banded-causal
update path (memory = stacked history with per-query masks)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def relative_pose(pose_a: jax.Array, pose_b: jax.Array) -> jax.Array:
    """pose_b - pose_a expressed in pose_a's frame; poses are (x, y, heading)
    (smt_state_encoder.py:207-234, including the heading negations)."""
    heading_a = -pose_a[..., 2]
    heading_b = -pose_b[..., 2]
    r = jnp.linalg.norm(pose_a[..., :2] - pose_b[..., :2] + 1e-12, axis=-1)
    phi = jnp.arctan2(
        pose_b[..., 1] - pose_a[..., 1], pose_b[..., 0] - pose_a[..., 0]
    ) - heading_a
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    heading = heading_b - heading_a
    heading = jnp.arctan2(jnp.sin(heading), jnp.cos(heading))
    return jnp.stack([x, y, -heading], axis=-1)


def format_pose(pose: jax.Array) -> jax.Array:
    """(x, y, heading, t) -> (x, y, cos h, sin h, e^{-t})
    (smt_state_encoder.py:239-245)."""
    x, y, h, t = jnp.moveaxis(pose, -1, 0)
    return jnp.stack([x, y, jnp.cos(h), jnp.sin(h), jnp.exp(-t)], axis=-1)


class _TransformerLayer(nn.Module):
    """Post-norm transformer layer (torch nn.Transformer convention)."""

    dim: int
    nhead: int
    cross: bool = False

    @nn.compact
    def __call__(self, x, kv=None, kv_bias=None, self_bias=None):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.dim, deterministic=True
        )
        y = attn(x, x, mask=self_bias)
        x = nn.LayerNorm()(x + y)
        if self.cross:
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, qkv_features=self.dim, deterministic=True
            )(x, kv, mask=kv_bias)
            x = nn.LayerNorm()(x + y)
        y = nn.Dense(self.dim)(nn.relu(nn.Dense(self.dim)(x)))
        return nn.LayerNorm()(x + y)


class SMTStateEncoder(nn.Module):
    """Inputs (batched over N):
    - x: [N, F] current step features (pose in the trailing pose_dims slots)
    - memory: [N, M, F] past step features
    - memory_masks: [N, M] floats, 1 = valid
    - goal: [N, dim] optional decoder query (the belief vector; if absent the
      current step embedding is the query, smt_state_encoder.py:141-156)
    Output: [N, dim] attended state."""

    dim: int = 256
    nhead: int = 8
    pose_dims: int = 4

    @nn.compact
    def __call__(self, x, memory, memory_masks, goal=None):
        p = self.pose_dims
        pose_enc = nn.Dense(16, name="pose_encoder")

        # re-encode all poses relative to the current agent pose
        cur_pose = x[..., -p:]  # [N, 4]
        mem_pose = memory[..., -p:]  # [N, M, 4]
        cur_rel = jnp.concatenate(
            [relative_pose(cur_pose[..., :3], cur_pose[..., :3]), cur_pose[..., 3:]],
            axis=-1,
        )
        mem_rel = jnp.concatenate(
            [
                relative_pose(cur_pose[:, None, :3], mem_pose[..., :3]),
                mem_pose[..., 3:],
            ],
            axis=-1,
        )
        x = jnp.concatenate([x[..., :-p], pose_enc(format_pose(cur_rel))], -1)
        memory = jnp.concatenate(
            [memory[..., :-p], pose_enc(format_pose(mem_rel))], -1
        )

        # append the current step to the memory (always valid)
        memory = jnp.concatenate([memory, x[:, None, :]], axis=1)  # [N, M+1, F']
        masks = jnp.concatenate(
            [memory_masks, jnp.ones(memory_masks.shape[:-1] + (1,))], axis=-1
        )

        fusion = nn.Sequential(
            [nn.Dense(self.dim), nn.relu, nn.Dense(self.dim)], name="fusion"
        )
        mem_e = fusion(memory)  # [N, M+1, dim]

        # flax attention masks are BOOLEAN (True = attend): [N, heads, q, k]
        key_bias = (masks[:, None, None, :] > 0)

        enc = _TransformerLayer(self.dim, self.nhead, cross=False, name="encoder")(
            mem_e, self_bias=key_bias
        )
        query = (
            goal[:, None, :]
            if goal is not None
            else mem_e[:, -1:, :]
        )
        dec = _TransformerLayer(self.dim, self.nhead, cross=True, name="decoder")(
            query, kv=enc, kv_bias=key_bias
        )
        return dec[:, 0, :]
