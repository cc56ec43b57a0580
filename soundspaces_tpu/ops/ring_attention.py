"""Memory-axis-sharded attention over the SMT external memory.

The reference's only long-context mechanism is SAVi's external scene memory
(up to 300 step embeddings attended by a 1+1-layer transformer,
ss_baselines/savi/models/smt_state_encoder.py:81-156); it never shards
sequence. This module is the TPU-native growth path SURVEY.md §5 calls out:
when the memory grows past one chip's HBM (longer horizons, richer
embeddings), shard the MEMORY axis over the ICI mesh and attend with
numerically-exact distributed softmax — each device holds only its memory
shard, queries replicate, and the combine is two `psum`s (max-shifted
sum-exp and weighted values), the blockwise/flash decomposition of softmax
attention.

Exactness: softmax(l)·V = (Σ_shard e^{l-m}·V) / (Σ_shard e^{l-m}) with a
global m = pmax(max_shard l); no approximation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def sharded_memory_attention(
    q: jax.Array,  # [N, H, D] queries (replicated across the mesh)
    k: jax.Array,  # [N, M_local, H, D] this shard's memory keys
    v: jax.Array,  # [N, M_local, H, D] this shard's memory values
    mask: jax.Array,  # [N, M_local] floats, 1 = valid
    axis_name: str,
) -> jax.Array:
    """Exact masked attention over a memory axis sharded across `axis_name`.
    Returns [N, H, D]. Call inside shard_map with k/v/mask sharded on their
    memory axis and q replicated."""
    d = q.shape[-1]
    logits = jnp.einsum("nhd,nmhd->nhm", q, k) / jnp.sqrt(
        jnp.float32(d)
    )
    logits = jnp.where(mask[:, None, :] > 0, logits, NEG_INF)
    m_local = logits.max(axis=-1)  # [N, H]
    m_global = jax.lax.pmax(m_local, axis_name)
    p = jnp.exp(logits - m_global[..., None])
    # a fully-masked shard contributes exp(NEG_INF - m) ~ 0 exactly:
    p = jnp.where(mask[:, None, :] > 0, p, 0.0)
    s = jax.lax.psum(p.sum(axis=-1), axis_name)  # [N, H]
    o = jax.lax.psum(jnp.einsum("nhm,nmhd->nhd", p, v), axis_name)
    return o / jnp.maximum(s, 1e-9)[..., None]


def memory_sharded_attention_fn(mesh, num_heads: int):
    """Wrap sharded_memory_attention in shard_map over `mesh`'s 'dp' axis:
    (q [N, H, D], k/v [N, M, H, D], mask [N, M]) -> [N, H, D] with the
    GLOBAL memory axis M sharded across devices (M % n_devices == 0)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from soundspaces_tpu.train.parallel import DP_AXIS

    def fn(q, k, v, mask):
        return shard_map(
            lambda q_, k_, v_, m_: sharded_memory_attention(
                q_, k_, v_, m_, DP_AXIS
            ),
            mesh=mesh,
            in_specs=(
                P(),
                P(None, DP_AXIS, None, None),
                P(None, DP_AXIS, None, None),
                P(None, DP_AXIS),
            ),
            out_specs=P(),
            check_rep=False,
        )(q, k, v, mask)

    return fn
