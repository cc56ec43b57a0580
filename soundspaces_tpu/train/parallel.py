"""Data parallelism over a jax.sharding.Mesh — the DD-PPO equivalent.

The reference scales by running one process per GPU with torch DDP gradient
all-reduce over GLOO/NCCL, TCPStore rendezvous, and straggler preemption
(av_nav/ddppo/ddppo.py, ddppo_trainer.py:276-325; SURVEY.md §2.7-2.8). On
TPU the same computation is a single SPMD program: envs shard across the
mesh's `dp` axis, params replicate, and gradient/statistic reduction is
`psum`/`pmean` compiled onto ICI. Lockstep SPMD removes the need for the
sync_frac straggler logic entirely — every shard runs the same fixed-length
rollout.

Multi-host (pod-slice) execution uses the same code path: call
`jax.distributed.initialize()` before building the mesh (replacing TCPStore
rendezvous, ddp_utils.py:126-174) and the mesh spans all hosts' devices.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_mesh(devices=None, axis: str = DP_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def shard_batch_env_axis(mesh: Mesh, tree: Any, num_envs: int) -> Any:
    """Shard leaves whose leading dim is the env axis over 'dp'; replicate
    everything else (e.g. a carry-level PRNG key)."""

    def put(x):
        if np.ndim(x) >= 1 and x.shape[0] == num_envs:
            spec = P(DP_AXIS, *([None] * (np.ndim(x) - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def data_parallel_step(mesh: Mesh, step_fn: Callable, num_envs: int):
    """Wrap a per-shard train step
    `step_fn(params, opt_state, carry, rng, *rest) -> (params, opt_state,
    carry, metrics)` into an SPMD program over `mesh`:

    - carry leaves with leading dim == num_envs shard over 'dp'; everything
      else (per-rollout PRNG key, params, optimizer) replicates;
    - the per-step rng is decorrelated across shards by folding in the shard
      index (the analog of the reference's per-rank seed offset,
      av_nav/ddppo/ddppo_trainer.py:125-127);
    - psum/pmean inside `step_fn` (ppo_update axis_name) reduce over 'dp'.
    """
    from jax.experimental.shard_map import shard_map

    def spec_for_carry(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == num_envs:
            return P(DP_AXIS, *([None] * (x.ndim - 1)))
        return P()

    def sharded_fn(params, opt_state, carry, rng, *rest):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DP_AXIS))
        carry = carry.replace(rng=jax.random.fold_in(carry.rng, jax.lax.axis_index(DP_AXIS)))
        return step_fn(params, opt_state, carry, rng, *rest)

    def wrapped(params, opt_state, carry, rng, *rest):
        carry_specs = jax.tree.map(spec_for_carry, carry)
        # pytree-prefix specs: a bare P() covers a whole replicated subtree;
        # the output carry has the same structure/shapes as the input carry.
        in_specs = (P(), P(), carry_specs, P()) + tuple(P() for _ in rest)
        out_specs = (P(), P(), carry_specs, P())
        return shard_map(
            sharded_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )(params, opt_state, carry, rng, *rest)

    return wrapped


def savi_data_parallel_step(mesh: Mesh, step_fn: Callable, num_envs: int):
    """SAVi variant of data_parallel_step: the step also carries the belief
    predictor's params/optimizer (the reference's BeliefPredictorDDP,
    savi/ddppo/algo/ddppo_trainer.py:90-97) —
    `step_fn(params, opt_state, bparams, bopt, carry, rng, *rest) ->
    (params, opt_state, bparams, bopt, carry, metrics)`. The SMT external
    memory shards with the env axis (its buffers are [N, M, dim])."""
    from jax.experimental.shard_map import shard_map

    def spec_for_carry(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == num_envs:
            return P(DP_AXIS, *([None] * (x.ndim - 1)))
        return P()

    def sharded_fn(params, opt_state, bparams, bopt, carry, rng, *rest):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DP_AXIS))
        carry = carry.replace(
            rng=jax.random.fold_in(carry.rng, jax.lax.axis_index(DP_AXIS))
        )
        return step_fn(params, opt_state, bparams, bopt, carry, rng, *rest)

    def wrapped(params, opt_state, bparams, bopt, carry, rng, *rest):
        carry_specs = jax.tree.map(spec_for_carry, carry)
        in_specs = (P(), P(), P(), P(), carry_specs, P()) + tuple(
            P() for _ in rest
        )
        out_specs = (P(), P(), P(), P(), carry_specs, P())
        return shard_map(
            sharded_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )(params, opt_state, bparams, bopt, carry, rng, *rest)

    return wrapped
