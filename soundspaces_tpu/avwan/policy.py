"""AV-WaN policy: masked 81-way waypoint categorical over fused
audio + geometric-map + acoustic-map features.

Reference: ss_baselines/av_wan/ppo/policy.py:25-215 (AudioCNN + MapCNN(gm)
+ MapCNN(am) -> GRU -> CategoricalNetWithMask over action_map_size^2) and
models/map_cnn.py:17-104."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from soundspaces_tpu.models.encoders import _ConvStack
from soundspaces_tpu.models.rnn_state_encoder import RNNStateEncoder


class MapCNN(nn.Module):
    """3-conv stack over map crops with per-size kernels (map_cnn.py:29-58)."""

    output_size: int = 256
    sensor: str = "gm"

    @nn.compact
    def __call__(self, observations):
        x = observations[self.sensor]
        size = x.shape[1]
        if size >= 100:  # 200^2 (or 400^2) geometric crop
            kernels, strides = ((8, 8), (4, 4), (3, 3)), ((4, 4), (2, 2), (2, 2))
        else:  # 20^2 acoustic map
            kernels, strides = ((5, 5), (3, 3), (3, 3)), ((2, 2), (1, 1), (1, 1))
        return _ConvStack(kernels, strides, self.output_size)(x)


class AVWanNet(nn.Module):
    """Feature net for the waypoint policy (av_wan/ppo/policy.py:140-215)."""

    hidden_size: int = 512
    use_gm: bool = True
    use_am: bool = True
    audio_sensor: str = "spectrogram"

    @nn.compact
    def __call__(self, observations, hidden, masks):
        ref = observations[self.audio_sensor]
        seq = ref.ndim == 5

        def encode(obs):
            from soundspaces_tpu.models.encoders import AudioCNN

            feats = [AudioCNN(self.hidden_size, self.audio_sensor)(obs)]
            if self.use_gm:
                feats.append(MapCNN(256, "gm")(obs))
            if self.use_am:
                feats.append(MapCNN(256, "am")(obs))
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
