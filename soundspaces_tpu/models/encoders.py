"""Convolutional observation encoders.

Capacity-matched to the reference's 3-conv stacks (32/64/64 channels,
8-4-3 kernels with 4-2-2 strides for images; the small-input kernel set for
spectrograms under 30 px — ss_baselines/av_nav/models/{visual_cnn,audio_cnn}.py)
but written NHWC + VALID padding so XLA lowers them directly onto the MXU,
with Kaiming-normal init matching the reference's layer_init.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")


def conv_output_hw(hw, kernels, strides):
    h, w = hw
    for (kh, kw), (sh, sw) in zip(kernels, strides):
        h = (h - kh) // sh + 1
        w = (w - kw) // sw + 1
    return h, w


class _ConvStack(nn.Module):
    kernels: Sequence[tuple[int, int]]
    strides: Sequence[tuple[int, int]]
    output_size: int
    channels: Sequence[int] = (32, 64, 64)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, H, W, C]
        for i, (ch, k, s) in enumerate(zip(self.channels, self.kernels, self.strides)):
            # clamp to the running spatial extent so sub-benchmark-size test
            # inputs degrade gracefully instead of underflowing to 0 px
            k = (min(k[0], x.shape[1]), min(k[1], x.shape[2]))
            s = (min(s[0], k[0]), min(s[1], k[1]))
            x = nn.Conv(ch, k, s, padding="VALID", kernel_init=_KAIMING)(x)
            if i < len(self.channels) - 1:
                x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.output_size, kernel_init=_KAIMING)(x)
        return nn.relu(x)


class VisualCNN(nn.Module):
    """RGB (normalized /255) and/or depth encoder -> output_size embedding.
    Reference: ss_baselines/av_nav/models/visual_cnn.py:53-161."""

    output_size: int = 512

    @nn.compact
    def __call__(self, observations: dict[str, jax.Array]) -> jax.Array:
        parts = []
        if "rgb" in observations:
            parts.append(observations["rgb"].astype(jnp.float32) / 255.0)
        if "depth" in observations:
            parts.append(observations["depth"])
        x = jnp.concatenate(parts, axis=-1)
        # adapt to small frames like the audio stack does (the reference's
        # image path assumes >= 128 px and would underflow below ~50 px)
        if x.shape[1] < 50 or x.shape[2] < 50:
            kernels, strides = ((5, 5), (3, 3), (3, 3)), ((2, 2), (2, 2), (1, 1))
        else:
            kernels, strides = ((8, 8), (4, 4), (3, 3)), ((4, 4), (2, 2), (2, 2))
        return _ConvStack(kernels, strides, self.output_size)(x)


class AudioCNN(nn.Module):
    """Spectrogram encoder -> output_size embedding. Kernel set switches for
    small inputs exactly like the reference
    (ss_baselines/av_nav/models/audio_cnn.py:32-37)."""

    output_size: int = 512
    sensor: str = "spectrogram"

    @nn.compact
    def __call__(self, observations: dict[str, jax.Array]) -> jax.Array:
        x = observations[self.sensor]
        h, w = x.shape[1], x.shape[2]
        if h < 30 or w < 30:
            kernels, strides = ((5, 5), (3, 3), (3, 3)), ((2, 2), (2, 2), (1, 1))
        else:
            kernels, strides = ((8, 8), (4, 4), (3, 3)), ((4, 4), (2, 2), (1, 1))
        return _ConvStack(kernels, strides, self.output_size)(x)
