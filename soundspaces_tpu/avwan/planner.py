"""Map-derived waypoint planning: the reference Planner's navigability graph
(ss_baselines/av_wan/models/planner.py:19-209) as bounded-iteration device
kernels over the agent-BUILT map.

The reference builds a networkx graph from the mapper's free/explored cells
(`_map_to_graph`, planner.py:170-209), masks waypoints by reachability
(`check_navigability`, 142-168), plans low-level actions with
nx.shortest_path (88-130), and removes graph nodes on collision evidence
(151-162). None of that sees the simulator's true walkability — the agent
plans on what it has mapped.

The reference plans OPTIMISTICALLY: `_map_to_graph` (planner.py:176-177,
"0 indicates free or unexplored") builds the full navigability graph from
the EMPTY map at construction — a cell is an obstacle only when
obstacle>=0.5 AND explored>=0.5 — and nodes/edges are REMOVED as mapped
obstacle and collision evidence accrues (update_map_and_graph,
planner.py:56-77). Unknown space is navigable until proven otherwise; the
mask starts wide and TIGHTENS with evidence.

TPU-native form, all static shapes:
- `coarse_free_window`: pool the 0.1 m geometric map into 0.5 m planning
  cells around the agent (free = no EXPLORED-obstacle evidence in the cell
  core — unexplored cells are free, matching planner.py:176-177; the
  agent's own cell is always free — it stands there).
- `reachable_from_center`: K-step BFS wavefront (4-neighbor dilation masked
  by free cells) — `check_navigability`.
- `distance_field`: min-plus BFS distances from the chosen waypoint —
  the shortest-path plan. Low-level actions greedily descend this field.
Collision evidence is written into the map by the env (cell ahead marked
obstacle), which removes it from `free` on the next pooling — the
reference's edge removal. Cells are restored simply by never persisting
the removal beyond the map contents (reset clears the map, planner.py:44-53).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = 1e6


def coarse_free_window(
    geo_obstacle: jax.Array,  # [M, M] 0.1 m obstacle-evidence plane
    geo_explored: jax.Array,  # [M, M] 0.1 m explored plane (separate
    # planes, not one stacked array — see MapperState for the TPU layout
    # rationale)
    cell_x: jax.Array,  # agent 0.5 m-cell coords, center-origin (cols)
    cell_z: jax.Array,  # rows
    window: int = 17,  # planning window in 0.5 m cells
    scale: int = 5,  # 0.1 m cells per planning cell
    obstacle_thresh: float = 0.5,  # planner._obstacle_threshold
) -> jax.Array:
    """[window, window] float32 free-cell mask around the agent (agent at
    the center cell). OPTIMISTIC, like the reference's map graph
    (planner.py:176-177): a planning cell is blocked only when its 3x3 core
    holds a fine cell with EXPLORED obstacle evidence (obstacle>=thresh AND
    explored>=thresh); unexplored space is free until proven otherwise."""
    m = geo_obstacle.shape[0]
    e = window * scale
    # pad so the window stays CENTERED on the agent even at the map border —
    # a clamped slice would shift the window while every consumer
    # (reachable_from_center, distance descent, the action mask) still treats
    # [c, c] as the agent's cell, silently misaligning all planning beyond
    # (m - e)/2 fine cells from the episode start. Zero padding = unexplored
    # = optimistically free, the same semantics as in-map unknown space.
    p = (e + 1) // 2
    # agent block's top-left in 0.1 m cells: pad + map center + cell*scale - e/2
    row = (p + m // 2 + cell_z * scale - e // 2).astype(jnp.int32)
    col = (p + m // 2 + cell_x * scale - e // 2).astype(jnp.int32)

    def _core(plane):
        padded = jnp.pad(plane, ((p, p), (p, p)))
        patch = jax.lax.dynamic_slice(padded, (row, col), (e, e))
        return patch.reshape(window, scale, window, scale)[
            :, 1 : scale - 1, :, 1 : scale - 1
        ]

    evidence = (_core(geo_obstacle) >= obstacle_thresh) & (
        _core(geo_explored) >= obstacle_thresh
    )
    free = ~evidence.any(axis=(1, 3))
    c = window // 2
    free = free.at[c, c].set(True)  # the agent's own cell
    return free.astype(jnp.float32)


def _dilate4(x: jax.Array) -> jax.Array:
    return jnp.maximum(
        jnp.maximum(
            jnp.pad(x, ((1, 0), (0, 0)))[:-1], jnp.pad(x, ((0, 1), (0, 0)))[1:]
        ),
        jnp.maximum(
            jnp.pad(x, ((0, 0), (1, 0)))[:, :-1],
            jnp.pad(x, ((0, 0), (0, 1)))[:, 1:],
        ),
    )


def reachable_from_center(free: jax.Array, iters: int | None = None) -> jax.Array:
    """[W, W] 1.0 where a free-cell path from the center exists within
    `iters` BFS steps (planner.check_navigability, planner.py:142-168)."""
    w = free.shape[0]
    iters = iters or 2 * w
    c = w // 2
    reach = jnp.zeros_like(free).at[c, c].set(1.0)

    def body(_, r):
        return jnp.maximum(r, _dilate4(r) * free)

    return jax.lax.fori_loop(0, iters, body, reach)


def distance_field(
    free: jax.Array, target_rc: jax.Array, iters: int | None = None
) -> jax.Array:
    """[W, W] BFS hop distances from target over free cells (INF where
    unreachable) — the nx.shortest_path plan (planner.py:88-130) as a
    min-plus wavefront."""
    w = free.shape[0]
    iters = iters or 2 * w
    blocked = free < 0.5
    dist = jnp.full((w, w), INF, jnp.float32)
    dist = dist.at[target_rc[0], target_rc[1]].set(0.0)
    dist = jnp.where(blocked, INF, dist)

    def body(_, d):
        shifted = jnp.stack(
            [
                jnp.pad(d, ((1, 0), (0, 0)), constant_values=INF)[:-1],
                jnp.pad(d, ((0, 1), (0, 0)), constant_values=INF)[1:],
                jnp.pad(d, ((0, 0), (1, 0)), constant_values=INF)[:, :-1],
                jnp.pad(d, ((0, 0), (0, 1)), constant_values=INF)[:, 1:],
            ]
        ).min(axis=0)
        better = jnp.minimum(d, shifted + 1.0)
        return jnp.where(blocked, INF, better)

    return jax.lax.fori_loop(0, iters, body, dist)


def descend_step(
    dist: jax.Array, agent_rc: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Greedy next move on the distance field: returns (dir_idx, improves)
    where dir_idx indexes (north/-row, south/+row, west/-col, east/+col) =
    world (-z, +z, -x, +x) and improves is False when no neighbor lowers the
    distance (unreachable / arrived)."""
    w = dist.shape[0]
    r, c = agent_rc[0], agent_rc[1]
    here = dist[r, c]

    def at(rr, cc):
        ok = (rr >= 0) & (rr < w) & (cc >= 0) & (cc < w)
        return jnp.where(
            ok, dist[jnp.clip(rr, 0, w - 1), jnp.clip(cc, 0, w - 1)], INF
        )

    neigh = jnp.stack([at(r - 1, c), at(r + 1, c), at(r, c - 1), at(r, c + 1)])
    best = jnp.argmin(neigh).astype(jnp.int32)
    improves = (neigh[best] < here) & (here < INF)
    return best, improves
