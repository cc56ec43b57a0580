"""Linear crossfade between consecutive audio windows (SS2.0 continuous mode).

Reference: soundspaces/continuous_simulator.py:47-53 — a 50 ms linear ramp
between the audio rendered with the previous step's RIR and the current one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("sampling_rate",))
def crossfade(x1: jax.Array, x2: jax.Array, sampling_rate: int) -> jax.Array:
    """x1, x2: [..., C, n_samples] (x1 may be just the head: any length
    >= fade_samples(sr)). Blends the first int(0.05*sr)+1 samples linearly
    from x1 to x2 and keeps x2 afterwards — x1 beyond the fade never
    contributes, which is why the previous-RIR convolution only needs to
    produce the head (see ContinuousAudioNavEnv._observe)."""
    n = int(0.05 * sampling_rate)
    w2 = jnp.arange(n + 1, dtype=x2.dtype) / n
    w1 = jnp.flip(w2)
    head = x1[..., : n + 1] * w1 + x2[..., : n + 1] * w2
    return jnp.concatenate([head, x2[..., n + 1 :]], axis=-1)


def fade_samples(sampling_rate: int) -> int:
    """Length of the crossfade region (50 ms + 1 sample)."""
    return int(0.05 * sampling_rate) + 1
