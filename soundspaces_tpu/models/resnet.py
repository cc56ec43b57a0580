"""GroupNorm ResNet visual encoders (the DD-PPO policy backbone family).

Reference: ss_baselines/savi/ddppo/policy/resnet.py:259-311 provides
resnet18/resnet50/SE-ResNeXt backbones with GroupNorm (batch statistics are
unusable in on-policy RL), fed by a running-mean-and-var input normalizer
(running_mean_and_var.py). This is the flax equivalent: resnet18/resnet50/
se_resnext50 constructors with GroupNorm everywhere, plus the real
running-statistics normalizer as explicitly carried (mean, var, count)
state (NormStats / update_norm_stats / normalize_visual_obs)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def _gn(num_channels: int) -> nn.GroupNorm:
    groups = max(1, min(32, num_channels // 8))
    return nn.GroupNorm(num_groups=groups)


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channels, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=_KAIMING)(x)
        y = nn.relu(_gn(self.channels)(y))
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    kernel_init=_KAIMING)(y)
        y = _gn(self.channels)(y)
        if x.shape[-1] != self.channels or self.stride != 1:
            x = nn.Conv(self.channels, (1, 1), (self.stride, self.stride),
                        use_bias=False, kernel_init=_KAIMING)(x)
            x = _gn(self.channels)(x)
        return nn.relu(x + y)


class Bottleneck(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out_ch = self.channels * 4
        y = nn.Conv(self.channels, (1, 1), use_bias=False,
                    kernel_init=_KAIMING)(x)
        y = nn.relu(_gn(self.channels)(y))
        y = nn.Conv(self.channels, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=_KAIMING)(y)
        y = nn.relu(_gn(self.channels)(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, kernel_init=_KAIMING)(y)
        y = _gn(out_ch)(y)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                        use_bias=False, kernel_init=_KAIMING)(x)
            x = _gn(out_ch)(x)
        return nn.relu(x + y)


class ResNet(nn.Module):
    stage_blocks: Sequence[int] = (2, 2, 2, 2)  # resnet18
    block: type = BasicBlock
    base_channels: int = 64
    output_size: int = 512

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        x = nn.Conv(self.base_channels, (7, 7), (2, 2), padding=3,
                    use_bias=False, kernel_init=_KAIMING)(x)
        x = nn.relu(_gn(self.base_channels)(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        ch = self.base_channels
        for stage, n_blocks in enumerate(self.stage_blocks):
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = self.block(ch, stride)(x)
            ch *= 2
        x = x.mean(axis=(1, 2))  # global average pool
        return nn.relu(nn.Dense(self.output_size, kernel_init=_KAIMING)(x))


class SEResNeXtBottleneck(nn.Module):
    """Squeeze-excitation ResNeXt bottleneck: grouped 3x3 conv (cardinality
    32) + channel-wise SE gating — the reference's SE/SEResNeXtBottleneck
    (ss_baselines/savi/ddppo/policy/resnet.py:83-180, se_resneXt
    constructors 259-311)."""

    channels: int
    stride: int = 1
    cardinality: int = 32
    se_reduction: int = 16

    @nn.compact
    def __call__(self, x):
        out_ch = self.channels * 4
        width = self.channels * 2  # ResNeXt 32x4d widening
        y = nn.Conv(width, (1, 1), use_bias=False, kernel_init=_KAIMING)(x)
        y = nn.relu(_gn(width)(y))
        y = nn.Conv(width, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=False, feature_group_count=self.cardinality,
                    kernel_init=_KAIMING)(y)
        y = nn.relu(_gn(width)(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, kernel_init=_KAIMING)(y)
        y = _gn(out_ch)(y)
        # squeeze-excite: GAP -> bottleneck MLP -> sigmoid channel gates
        s = y.mean(axis=(-3, -2))
        s = nn.relu(nn.Dense(max(out_ch // self.se_reduction, 4),
                             kernel_init=_KAIMING)(s))
        s = nn.sigmoid(nn.Dense(out_ch, kernel_init=_KAIMING)(s))
        y = y * s[..., None, None, :]
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                        use_bias=False, kernel_init=_KAIMING)(x)
            x = _gn(out_ch)(x)
        return nn.relu(x + y)


def resnet18(output_size: int = 512) -> ResNet:
    return ResNet((2, 2, 2, 2), BasicBlock, output_size=output_size)


def resnet50(output_size: int = 512) -> ResNet:
    return ResNet((3, 4, 6, 3), Bottleneck, output_size=output_size)


def se_resnext50(output_size: int = 512) -> ResNet:
    return ResNet((3, 4, 6, 3), SEResNeXtBottleneck, output_size=output_size)


BACKBONES = {
    "resnet18": resnet18,
    "resnet50": resnet50,
    "se_resnext50": se_resnext50,
}


class NormStats(struct.PyTreeNode):
    """Running per-channel input-normalizer state — the reference's
    RunningMeanAndVar buffers (ss_baselines/savi/ddppo/policy/
    running_mean_and_var.py). Carried explicitly through the functional
    training path (like every other env/train state) instead of hiding in
    module buffers; updated during rollout collection, frozen at eval."""

    mean: jax.Array  # [C]
    var: jax.Array  # [C]
    count: jax.Array  # scalar

    @classmethod
    def zeros(cls, channels: int) -> "NormStats":
        return cls(
            mean=jnp.zeros((channels,)),
            var=jnp.zeros((channels,)),
            count=jnp.zeros(()),
        )


def update_norm_stats(
    stats: NormStats, x: jax.Array, axis_name: str | None = None
) -> NormStats:
    """Fold one batch's per-channel (spatially pooled) moments into the
    running statistics with Chan's parallel-variance merge — exactly the
    reference's forward-in-training-mode update (running_mean_and_var.py:
    adaptive_avg_pool2d sums, M2 merge, no -1 correction). x: [B, H, W, C]
    (leading axes beyond 4 are flattened into the batch). With `axis_name`
    the batch moments psum across the data-parallel mesh axis (the
    reference's distrib.all_reduce)."""
    x = x.reshape((-1,) + x.shape[-3:])
    pooled = x.mean(axis=(-3, -2))  # [B, C] per-image channel means
    n_new = jnp.float32(pooled.shape[0])
    sum_new = pooled.sum(axis=0)
    if axis_name is not None:
        n_new = jax.lax.psum(n_new, axis_name)
        sum_new = jax.lax.psum(sum_new, axis_name)
    mean_new = sum_new / n_new
    var_sum = ((pooled - mean_new) ** 2).sum(axis=0)
    if axis_name is not None:
        var_sum = jax.lax.psum(var_sum, axis_name)
    var_new = var_sum / n_new  # "No -1 ... it doesn't matter" (reference)
    n_old = stats.count
    tot = n_old + n_new
    m2 = (
        stats.var * n_old
        + var_new * n_new
        + (mean_new - stats.mean) ** 2 * n_old * n_new / tot
    )
    return NormStats(
        mean=(n_old * stats.mean + n_new * mean_new) / tot,
        var=m2 / tot,
        count=tot,
    )


def apply_norm(stats: NormStats, x: jax.Array) -> jax.Array:
    """(x - mean) / max(std, 0.1) with the reference's variance floor."""
    stdev = jnp.sqrt(jnp.maximum(stats.var, 1e-2))
    return (x - stats.mean) / stdev


def normalized_visual_channels(observations: dict) -> int:
    """Channel count the normalizer tracks for an observation suite."""
    c = 0
    if "rgb" in observations:
        c += observations["rgb"].shape[-1]
    if "depth" in observations:
        c += observations["depth"].shape[-1]
    return c


def normalize_visual_obs(
    stats: NormStats, observations: dict, update: bool = False,
    axis_name: str | None = None,
) -> tuple[NormStats, dict]:
    """Normalize rgb/depth with the running statistics (resnet_policy.py's
    input stack); optionally fold this batch in first. Returns the (maybe
    updated) stats and the observation dict with normalized visuals."""
    parts = []
    if "rgb" in observations:
        parts.append(observations["rgb"].astype(jnp.float32) / 255.0)
    if "depth" in observations:
        parts.append(observations["depth"])
    if not parts:
        return stats, observations
    x = jnp.concatenate(parts, axis=-1)
    if update:
        stats = update_norm_stats(stats, x, axis_name)
    x = apply_norm(stats, x)
    out = dict(observations)
    ofs = 0
    if "rgb" in observations:
        c = observations["rgb"].shape[-1]
        out["rgb_normalized"] = x[..., ofs : ofs + c]
        ofs += c
    if "depth" in observations:
        c = observations["depth"].shape[-1]
        out["depth"] = x[..., ofs : ofs + c]
    return stats, out


class ResNetVisualEncoder(nn.Module):
    """Drop-in alternative to VisualCNN: rgb/depth -> embedding via a
    GroupNorm ResNet (resnet18/resnet50/se_resnext50). Input normalization
    is the trainer's job: it carries NormStats and feeds pre-normalized
    observations (normalize_visual_obs), updating during rollouts and
    freezing at eval — the RunningMeanAndVar semantics of
    resnet_policy.py."""

    output_size: int = 512
    backbone: str = "resnet18"

    @nn.compact
    def __call__(self, observations):
        parts = []
        if "rgb_normalized" in observations:
            parts.append(observations["rgb_normalized"])
        elif "rgb" in observations:
            parts.append(observations["rgb"].astype(jnp.float32) / 255.0)
        if "depth" in observations:
            parts.append(observations["depth"])
        x = jnp.concatenate(parts, axis=-1)
        return BACKBONES[self.backbone](self.output_size)(x)
