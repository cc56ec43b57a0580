"""External scene memory: fixed-shape ring buffer with validity masks.

Reference: ExternalMemory (ss_baselines/savi/models/rollout_storage.py:
349-445) — a (capacity, N, dim) buffer with per-env masks, capacity
eviction, and episode-reset masking. Here it is a flax.struct pytree whose
insert is a dynamic_update + mask rotate, vmapped over envs."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ExternalMemory:
    """Batched memory: buffer [N, M, dim], masks [N, M] (1 = valid), idx [N]
    (next write slot)."""

    buffer: jax.Array
    masks: jax.Array
    idx: jax.Array

    @classmethod
    def zeros(cls, num_envs: int, capacity: int, dim: int) -> "ExternalMemory":
        return cls(
            buffer=jnp.zeros((num_envs, capacity, dim), jnp.float32),
            masks=jnp.zeros((num_envs, capacity), jnp.float32),
            idx=jnp.zeros((num_envs,), jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.buffer.shape[1]

    def insert(self, features: jax.Array, not_done: jax.Array) -> "ExternalMemory":
        """features: [N, dim]; not_done: [N] 1.0 while the episode continues.
        Episode reset invalidates the whole memory (masks *= not_done,
        rollout_storage.py:376) BEFORE writing the new step."""

        def one(buf, mask, i, feat, nd):
            mask = mask * nd
            buf = jax.lax.dynamic_update_slice(buf, feat[None, :], (i, 0))
            mask = mask.at[i].set(1.0)
            return buf, mask, (i + 1) % self.capacity

        buf, masks, idx = jax.vmap(one)(
            self.buffer, self.masks, self.idx, features, not_done
        )
        return ExternalMemory(buffer=buf, masks=masks, idx=idx)
