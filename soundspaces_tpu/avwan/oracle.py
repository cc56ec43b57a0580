"""Oracle waypoint chooser over the hierarchical env's action map.

Promoted from tools/avwan_probe.py (round 4's planner-vs-policy isolation
probe) so the trainer can consume it as a DAgger teacher: among mask-valid
action-map cells, pick the one minimizing (hops agent->target + hops
target->goal), tie-broken by remaining hops to goal — i.e. the farthest
mask-admissible waypoint ON a geodesic shortest path; STOP at the goal.
The geodesic-hops table is privileged (training-time-only) information,
exactly like the reference's own shortest-path supervision signals
(soundspaces/tasks/nav.py ShortestPathFollower role); the deployed policy
never sees it.

Driving the full map-planner stack with this chooser scores success 1.000 /
SPL 0.731 on the realistic world (results/avwan_oracle_probe_r4.json) —
the upper bound the learned waypoint head is trained toward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cell_costs(env, scene, tables, st, rows, cols):
    """Per-cell waypoint evaluation for ONE env state: (valid,
    path = h_nt + h_tg, h_tg, h_ng). The oracle drive, the probe
    diagnostics, and the DAgger labels all derive from exactly these
    terms, so they cannot drift apart."""
    from soundspaces_tpu.scene.graph import UNREACHABLE

    base = st.base
    tnode = env._waypoint_node(scene, tables, base, rows, cols)
    mask = env._action_mask(scene, tables, st)
    tn = jnp.maximum(tnode, 0)
    h_nt = scene.geodesic_hops[base.node, tn].astype(jnp.int32)
    h_tg = scene.geodesic_hops[tn, base.goal_node].astype(jnp.int32)
    valid = (
        (mask > 0.5)
        & (tnode >= 0)
        & (h_nt < UNREACHABLE)
        & (h_tg < UNREACHABLE)
    )
    h_ng = scene.geodesic_hops[base.node, base.goal_node].astype(jnp.int32)
    return valid, h_nt + h_tg, h_tg, h_ng


def oracle_cost(valid, path, h_tg):
    """The oracle's tie-broken cost: primary stay-on-a-shortest-path
    (minimal h_nt + h_tg), secondary maximal progress (minimal h_tg) —
    the STOP center cell ties on the primary term but always loses the
    tie-break to any forward on-path cell."""
    cost = path * 10000 + h_tg
    return jnp.where(valid, cost, jnp.int32(2**30))


def oracle_waypoints(env, scene, tables, state):
    """Per-env oracle waypoint indices over the CURRENT action mask."""
    a = env.wp.mapper.action_map_size
    idxs = jnp.arange(a * a)
    rows, cols = idxs // a, idxs % a

    def one(st):
        valid, path, h_tg, h_ng = cell_costs(env, scene, tables, st, rows, cols)
        best = jnp.argmin(oracle_cost(valid, path, h_tg)).astype(jnp.int32)
        return jnp.where(h_ng == 0, jnp.int32(a * a // 2), best)

    return jax.vmap(one)(state)


def acceptable_waypoints(env, scene, tables, state):
    """Per-env (oracle label [N], acceptable-set mask [N, A]).

    The DAgger loss supervises on the SET, not the single argmin: the
    oracle's exact cell is a function of privileged geodesic tables the
    observations (audio + partial maps) cannot fully disambiguate — an
    exact-label CE floors near log(#plausible cells) and the policy stays
    diffuse (measured: CE stuck ~3.2, match <= 0.10 on the synthetic
    world). Any mask-valid cell ON a shortest path (h_nt + h_tg == h_ng)
    with STRICT goalward progress (h_tg < h_ng) is task-equivalent up to
    waypoint granularity, so the marginal CE over that set is the right
    imitation target. Falls back to the exact oracle label when the mask
    admits no strictly-progressing on-path cell; STOP (center) alone is
    acceptable at the goal."""
    a = env.wp.mapper.action_map_size
    idxs = jnp.arange(a * a)
    rows, cols = idxs // a, idxs % a
    center = a * a // 2

    def one(st):
        valid, path, h_tg, h_ng = cell_costs(env, scene, tables, st, rows, cols)
        best = jnp.argmin(oracle_cost(valid, path, h_tg)).astype(jnp.int32)
        label = jnp.where(h_ng == 0, jnp.int32(center), best)
        accept = valid & (path == h_ng) & (h_tg < h_ng)
        accept = jnp.where(jnp.any(accept), accept, idxs == label)
        accept = jnp.where(h_ng == 0, idxs == center, accept)
        return label, accept

    return jax.vmap(one)(state)
