"""Memory-axis-sharded attention over the SMT external memory.

The reference's only long-context mechanism is SAVi's external scene memory
(up to 300 step embeddings attended by a 1+1-layer transformer,
ss_baselines/savi/models/smt_state_encoder.py:81-156); it never shards
sequence. This module is the TPU-native growth path SURVEY.md §5 calls out:
when the memory grows past one chip's HBM (longer horizons, richer
embeddings), shard the MEMORY axis over an ICI mesh axis and attend with
numerically-exact distributed softmax — each device holds only its memory
shard, queries replicate, and the combine is two `psum`s (max-shifted
sum-exp and weighted values): the blockwise/flash decomposition of softmax
attention realized with all-reduces. (A ppermute ring schedule is the
further refinement when overlap matters; the math here is identical.)

Exactness: softmax(l)·V = (Σ_shard e^{l-m}·V) / (Σ_shard e^{l-m}) with a
global m = pmax(max_shard l); no approximation.

Composing with data parallelism: give the memory shards their OWN mesh
axis (e.g. Mesh(devices.reshape(dp, mem), ("dp", "mem"))) — the batch/env
axis stays on "dp" while `axis_name="mem"` reduces over the memory axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def sharded_memory_attention(
    q: jax.Array,  # [N, H, D] queries (replicated over the memory axis)
    k: jax.Array,  # [N, M_local, H, D] this shard's memory keys
    v: jax.Array,  # [N, M_local, H, D] this shard's memory values
    mask: jax.Array,  # [N, M_local] floats, 1 = valid
    axis_name: str,
) -> jax.Array:
    """Exact masked attention over a memory axis sharded across `axis_name`.
    Returns [N, H, D]. Call inside shard_map with k/v/mask sharded on their
    memory axis and q replicated. Differentiable: the global max shift
    cancels in the normalized output, so its gradient is stopped (pmax has
    no differentiation rule)."""
    d = q.shape[-1]
    logits = jnp.einsum("nhd,nmhd->nhm", q, k) / jnp.sqrt(jnp.float32(d))
    logits = jnp.where(mask[:, None, :] > 0, logits, NEG_INF)
    m_local = logits.max(axis=-1)  # [N, H]
    # stop_gradient BEFORE pmax: pmax has no differentiation rule, and the
    # max shift cancels in the normalized output anyway
    m_global = jax.lax.pmax(jax.lax.stop_gradient(m_local), axis_name)
    p = jnp.exp(logits - m_global[..., None])
    # a fully-masked shard contributes exactly zero:
    p = jnp.where(mask[:, None, :] > 0, p, 0.0)
    s = jax.lax.psum(p.sum(axis=-1), axis_name)  # [N, H]
    o = jax.lax.psum(jnp.einsum("nhm,nmhd->nhd", p, v), axis_name)
    return o / jnp.maximum(s, 1e-9)[..., None]


def memory_sharded_attention_fn(mesh, axis_name: str):
    """Wrap sharded_memory_attention in shard_map over `mesh`'s `axis_name`
    axis: (q [N, H, D], k/v [N, M, H, D], mask [N, M]) -> [N, H, D] with the
    GLOBAL memory axis M sharded across that axis (M % axis_size == 0)."""
    from jax.sharding import PartitionSpec as P

    def fn(q, k, v, mask):
        return jax.shard_map(
            lambda q_, k_, v_, m_: sharded_memory_attention(
                q_, k_, v_, m_, axis_name
            ),
            mesh=mesh,
            in_specs=(
                P(),
                P(None, axis_name, None, None),
                P(None, axis_name, None, None),
                P(None, axis_name),
            ),
            out_specs=P(),
            check_vma=False,
        )(q, k, v, mask)

    return fn
