"""Mask-aware recurrent state encoder.

The reference implements episode-boundary masking by splitting the time
sequence at zero-mask steps in Python and running cuDNN GRU segments between
them (ss_baselines/av_nav/models/rnn_state_encoder.py:92-143). On TPU the
idiomatic form is a `lax.scan` over time that multiplies the carried hidden
state by the step mask — identical math, no data-dependent control flow, and
it fuses into one compiled loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class RNNStateEncoder(nn.Module):
    """GRU (optionally LSTM) over masked steps.

    - single step:  x [B, D], hidden [B, H] (LSTM: [B, 2H]), mask [B]
    - sequence:     x [T, B, D], hidden [B, H], mask [T, B]
    Hidden state is zeroed wherever mask == 0 *before* consuming that step's
    input, matching the reference's `_mask_hidden` placement.
    """

    hidden_size: int = 512
    rnn_type: str = "gru"

    def _cell(self):
        if self.rnn_type == "gru":
            return nn.GRUCell(
                features=self.hidden_size,
                kernel_init=nn.initializers.orthogonal(),
                recurrent_kernel_init=nn.initializers.orthogonal(),
            )
        if self.rnn_type == "lstm":
            return nn.OptimizedLSTMCell(
                features=self.hidden_size,
                kernel_init=nn.initializers.orthogonal(),
                recurrent_kernel_init=nn.initializers.orthogonal(),
            )
        raise ValueError(self.rnn_type)

    def _pack(self, carry):
        if self.rnn_type == "lstm":
            return jnp.concatenate(carry, axis=-1)
        return carry

    def _unpack(self, hidden):
        if self.rnn_type == "lstm":
            return (hidden[..., : self.hidden_size], hidden[..., self.hidden_size :])
        return hidden

    @nn.compact
    def __call__(self, x: jax.Array, hidden: jax.Array, masks: jax.Array):
        cell = self._cell()

        def step(carry, inp):
            xt, mt = inp
            carry = jax.tree.map(lambda h: h * mt[:, None], carry)
            carry, out = cell(carry, xt)
            return carry, out

        if x.ndim == 2:  # single step
            carry, out = step(self._unpack(hidden), (x, masks))
            return out, self._pack(carry)

        carry = self._unpack(hidden)
        if self.is_initializing():
            carry, outs = step(carry, (x[0], masks[0]))
            outs = jnp.broadcast_to(outs, x.shape[:2] + (self.hidden_size,))
        else:
            carry, outs = jax.lax.scan(step, carry, (x, masks))
        return outs, self._pack(carry)

    def initial_state(self, batch: int) -> jax.Array:
        mult = 2 if self.rnn_type == "lstm" else 1
        return jnp.zeros((batch, self.hidden_size * mult), jnp.float32)
