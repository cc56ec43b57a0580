"""Unit semantics of the map-planning kernels (avwan/planner.py) against the
reference planner's graph behavior (ss_baselines/av_wan/models/planner.py):
optimistic navigability (unexplored = free, planner.py:176-177), obstacle
evidence removal (update_map_and_graph, 56-77), BFS shortest-path descent
(plan, 88-130)."""

import numpy as np

import jax.numpy as jnp

from soundspaces_tpu.avwan.planner import (
    INF,
    coarse_free_window,
    descend_step,
    distance_field,
    reachable_from_center,
)

W = 9  # planning window
S = 5  # fine cells per planning cell
M = 100  # fine map size


def _empty_geometric():
    # two separate [M, M] planes (obstacle, explored) — MapperState layout
    return (jnp.zeros((M, M), jnp.float32), jnp.zeros((M, M), jnp.float32))


def _stamp(geo, cell_z, cell_x, obstacle, explored):
    """Write a full planning-cell block of fine cells (centered layout:
    planning cell k spans fine rows M//2 + k*S - S//2 ... + S)."""
    obs_p, exp_p = geo
    r0 = M // 2 + cell_z * S - S // 2
    c0 = M // 2 + cell_x * S - S // 2
    obs_p = obs_p.at[r0 : r0 + S, c0 : c0 + S].set(obstacle)
    exp_p = exp_p.at[r0 : r0 + S, c0 : c0 + S].set(explored)
    return (obs_p, exp_p)


def test_empty_map_is_all_free():
    """Optimism: with nothing explored, every planning cell is free
    (planner.py:176-177 builds the full graph from the empty map)."""
    free = coarse_free_window(*_empty_geometric(), jnp.int32(0), jnp.int32(0),
                              window=W, scale=S)
    assert float(free.sum()) == W * W


def test_unexplored_obstacle_is_still_free():
    """Obstacle evidence only counts when the cell is EXPLORED (the
    reference's bitwise_and of obstacle>=0.5 AND explored>=0.5)."""
    geo = _stamp(_empty_geometric(), 2, 1, obstacle=1.0, explored=0.0)
    free = np.asarray(coarse_free_window(*geo, jnp.int32(0), jnp.int32(0),
                                         window=W, scale=S))
    assert free[W // 2 + 2, W // 2 + 1] == 1.0


def test_explored_obstacle_blocks_cell():
    geo = _stamp(_empty_geometric(), 2, 1, obstacle=1.0, explored=1.0)
    free = np.asarray(coarse_free_window(*geo, jnp.int32(0), jnp.int32(0),
                                         window=W, scale=S))
    assert free[W // 2 + 2, W // 2 + 1] == 0.0
    # explored FREE space stays free
    geo2 = _stamp(_empty_geometric(), 2, 1, obstacle=0.0, explored=1.0)
    free2 = np.asarray(coarse_free_window(*geo2, jnp.int32(0), jnp.int32(0),
                                          window=W, scale=S))
    assert free2[W // 2 + 2, W // 2 + 1] == 1.0


def test_reachability_cut_by_evidence_wall():
    """A full explored-obstacle wall row severs BFS reachability
    (check_navigability, planner.py:142-168)."""
    free = jnp.ones((W, W), jnp.float32)
    free = free.at[2, :].set(0.0)  # wall above the center row
    reach = np.asarray(reachable_from_center(free))
    assert reach[W // 2, W // 2] == 1.0
    assert reach[3:, :].sum() > 0
    assert reach[:2, :].sum() == 0.0  # beyond the wall: unreachable


def test_distance_field_routes_around_obstacle():
    """BFS distances detour around blocked cells (nx.shortest_path role,
    planner.py:88-130): with a wall gap, the path through the gap is
    longer than the straight line but finite."""
    free = jnp.ones((W, W), jnp.float32)
    free = free.at[2, : W - 1].set(0.0)  # wall with a gap at the right edge
    target = jnp.asarray([0, W // 2])  # beyond the wall
    dist = np.asarray(distance_field(free, target))
    c = W // 2
    straight = abs(0 - c) + 0
    assert dist[c, c] < INF  # reachable through the gap
    assert dist[c, c] > straight  # but strictly longer than the direct line
    # fully sealed wall: unreachable
    sealed = jnp.ones((W, W), jnp.float32).at[2, :].set(0.0)
    dist2 = np.asarray(distance_field(sealed, target))
    assert dist2[c, c] >= INF


def test_descend_step_moves_toward_target():
    free = jnp.ones((W, W), jnp.float32)
    target = jnp.asarray([W // 2, W - 1])  # due east
    dist = distance_field(free, target)
    d, improves = descend_step(dist, jnp.asarray([W // 2, W // 2]))
    assert bool(improves)
    assert int(d) == 3  # (N, S, W, E) -> east


def test_descend_step_stuck_on_unreachable():
    sealed = jnp.ones((W, W), jnp.float32).at[2, :].set(0.0)
    target = jnp.asarray([0, W // 2])
    dist = distance_field(sealed, target)
    _, improves = descend_step(dist, jnp.asarray([W // 2, W // 2]))
    assert not bool(improves)


def test_window_stays_agent_centered_at_map_border():
    """An agent far from the episode start (planning window overhanging the
    internal map edge) must still see itself at the window center: a mapped
    obstacle one planning cell ahead must appear at [c-1, c], not shifted
    (a clamped slice used to shift the whole window, silently misaligning
    the mask/plan near borders — MP3D-scale houses exceed the margin)."""
    # agent near the top-left corner: the window overhangs the map edge by
    # 12 fine cells, while the wall cell (one planning cell north) is still
    # fully on-map
    cz = cx = -8
    geo = _stamp(_empty_geometric(), cz - 1, cx, 1.0, 1.0)  # wall just north
    free = coarse_free_window(*geo, jnp.int32(cx), jnp.int32(cz),
                              window=W, scale=S)
    c = W // 2
    assert float(free[c, c]) == 1.0
    assert float(free[c - 1, c]) == 0.0, "obstacle must sit one cell ahead"
    # off-map cells are unexplored -> optimistically free, not blocked
    assert float(free.sum()) == W * W - 1
