"""SceneGraph and asset-bank semantics: step/geodesic tables must reproduce
the reference's networkx-based navigation (soundspaces/simulator.py:499-516,
703-712)."""

import numpy as np
import pytest

from soundspaces_tpu.scene import SceneGraph, make_synthetic_assets
from soundspaces_tpu.scene.graph import UNREACHABLE


def line_graph(n=4, grid=0.5):
    # nodes along +x; reference direction of +x is 0 degrees
    pts = np.array([[i * grid, 0.0, 0.0] for i in range(n)], np.float32)
    edges = np.array([[i, i + 1] for i in range(n - 1)])
    return SceneGraph.from_edges(pts, edges, grid)


def test_forward_neighbor_matches_reference_convention():
    g = line_graph()
    # direction to +x neighbor is 0 deg; orientation==0 requires rotation 270
    # ((270 - rot) % 360 == 0  =>  rot = 270, rot_idx 3)
    assert g.forward_neighbor[0, 3] == 1
    # -x neighbor: direction 180 -> rotation 90 (rot_idx 1)
    assert g.forward_neighbor[1, 1] == 0
    # no neighbor along z: other rotations blocked
    assert g.forward_neighbor[0, 0] == -1 and g.forward_neighbor[0, 2] == -1


def test_geodesic_matches_hops():
    g = line_graph(5)
    assert g.geodesic_hops[0, 4] == 4
    assert g.geodesic_distance(0, 4) == pytest.approx(2.0)
    assert g.geodesic_hops[2, 2] == 0


def test_oracle_next_hop_walks_shortest_path():
    g = SceneGraph.grid(5, 5)
    start, goal = 0, g.num_nodes - 1
    node, hops = start, 0
    while node != goal and hops < 100:
        node = int(g.oracle_action[node, goal])
        assert node >= 0
        hops += 1
    assert node == goal
    assert hops == g.geodesic_hops[start, goal]


def test_grid_scene_connected():
    g = SceneGraph.grid(8, 8, obstacle_fraction=0.25, seed=1)
    assert (g.geodesic_hops < UNREACHABLE).all(), "largest component must be fully connected"
    # forward tables are self-consistent: stepping forward then backward returns
    fwd = g.forward_neighbor
    for a in range(g.num_nodes):
        for r in range(4):
            b = fwd[a, r]
            if b >= 0:
                back = fwd[b, (r + 2) % 4]
                assert back == a


def test_oracle_next_hop_adjacent_after_component_trim():
    """Regression: largest_component must remap the node IDS stored in
    oracle_action, not just slice the table."""
    g = SceneGraph.grid(8, 8, obstacle_fraction=0.35, seed=31)
    for v in range(g.num_nodes):
        for goal in range(0, g.num_nodes, 7):
            nxt = g.oracle_action[v, goal]
            if v == goal or nxt < 0:
                continue
            assert nxt in list(g.forward_neighbor[v]), (v, goal, nxt)


def test_synthetic_assets_shapes():
    assets = make_synthetic_assets(num_nodes_hint=40, sampling_rate=4000,
                                   rir_max_len=2000, image_size=32)
    ac = assets.acoustics
    n = assets.graph.num_nodes
    assert ac.rir.shape[:2] == (4, n) and ac.rir.shape[3:] == (2, 2000)
    assert ac.seg_fft.ndim == 3 and ac.seg_fft.dtype == np.complex64
    assert assets.frames.modalities["depth"].shape == (n, 4, 32, 32, 1)
    # goal slot mapping round-trips
    for slot, node in enumerate(ac.goal_nodes):
        assert ac.goal_slot_of_node[node] == slot


def test_rir_bank_has_distance_structure():
    """Closer receivers must get more energy (the cue policies learn from)."""
    assets = make_synthetic_assets(num_nodes_hint=40, sampling_rate=4000,
                                   rir_max_len=2000, image_size=8)
    g, ac = assets.graph, assets.acoustics
    goal = int(ac.goal_nodes[0])
    e = (ac.rir[0, :, 0] ** 2).sum(axis=(-2, -1))  # [N]
    d = g.geodesic_hops[:, goal].astype(float)
    near = e[d <= 2].mean()
    far = e[d >= max(d[d < 30000].max() - 1, 3)].mean()
    assert near > far
