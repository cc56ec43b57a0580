"""Navigation graphs as dense arrays with precomputed geodesics.

The reference moves the agent over a networkx graph whose nodes carry 3-D
`point` coordinates (soundspaces/utils.py:15-39): MOVE_FORWARD searches the
current node's neighbors for one whose compass direction matches the agent's
orientation (simulator.py:501-511); geodesic distance is
`nx.shortest_path_length * GRID_SIZE` (simulator.py:703-712).

TPU-native form: everything becomes a static table built once on host —
- `forward_neighbor[node, rot_idx]`: the node reached by MOVE_FORWARD at
  rotation 90*rot_idx degrees, or -1 (collision). The reference's
  orientation conversion ((270 - rotation) % 360, simulator.py:564-566) is
  baked into the table so the device never does angle math.
- `geodesic_hops[node, node]`: all-pairs BFS hop counts (distance =
  hops * grid_size).
- `next_hop_action[node, goal]`: the oracle greedy action toward `goal`
  (used by the shortest-path follower and oracle-action sensor,
  soundspaces/simulator.py:725-751, tasks/shortest_path_follower.py).
At runtime a step is two int32 gathers — no graph search, no host calls.
"""

from __future__ import annotations

import dataclasses
import pickle

import numpy as np

UNREACHABLE = np.int32(2**15 - 1)

# Discrete actions (matching HabitatSimActions registration order used by the
# reference: STOP/MOVE_FORWARD/TURN_LEFT/TURN_RIGHT, plus the extended
# MoveOnlySpaceConfiguration backward/left/right of
# soundspaces/tasks/action_space.py:12-46).
STOP = 0
MOVE_FORWARD = 1
TURN_LEFT = 2
TURN_RIGHT = 3
# extended ids (HabitatSimActions.extend_action_space order,
# soundspaces/tasks/action_space.py:12-14): translations without rotation
MOVE_BACKWARD = 4
MOVE_LEFT = 5
MOVE_RIGHT = 6

# named action subsets (the ActionSpaceConfiguration role): a task exposes
# one subset; policies index into it and the env maps back to global ids
ACTION_SPACES = {
    "default": (STOP, MOVE_FORWARD, TURN_LEFT, TURN_RIGHT),
    # "move-all" (MoveOnlySpaceConfiguration, action_space.py:17-46):
    # pure translations, no turns
    "move-all": (STOP, MOVE_FORWARD, MOVE_BACKWARD, MOVE_RIGHT, MOVE_LEFT),
}


@dataclasses.dataclass
class SceneGraph:
    """Host-side (numpy) scene graph; arrays are ready for device upload."""

    points: np.ndarray  # [N, 3] float32 node positions (x, y, z)
    forward_neighbor: np.ndarray  # [N, 4] int32, -1 = blocked
    geodesic_hops: np.ndarray  # [N, N] int16, UNREACHABLE if disconnected
    oracle_action: np.ndarray  # [N, N] int16 next-hop node toward goal (-1 at goal)
    grid_size: float = 0.5
    # Original reference node ids, [N] int64. The reference's graph.pkl files
    # have GAPS in their node numbering (generate_replica_metadata.py:20-58
    # removes nodes by hand; generate_matterport3d_metadata.py:20-30 trims
    # small components) and its RIR files are named by those original ids
    # (`{azimuth}/{receiver}_{source}.wav`, simulator.py:614-616). Internally
    # every table is dense row-indexed; this map recovers the on-disk id.
    node_ids: np.ndarray | None = None

    def __post_init__(self):
        if self.node_ids is None:
            self.node_ids = np.arange(self.points.shape[0], dtype=np.int64)

    @property
    def num_nodes(self) -> int:
        return self.points.shape[0]

    def geodesic_distance(self, a: int, b: int) -> float:
        return float(self.geodesic_hops[a, b]) * self.grid_size

    # ------------------------------------------------------------------ build
    @classmethod
    def from_edges(
        cls,
        points: np.ndarray,
        edges: np.ndarray,
        grid_size: float = 0.5,
    ) -> "SceneGraph":
        """points: [N, 3]; edges: [M, 2] undirected node-index pairs."""
        points = np.asarray(points, np.float32)
        n = points.shape[0]
        adj: list[list[int]] = [[] for _ in range(n)]
        for a, b in np.asarray(edges, np.int64):
            adj[a].append(int(b))
            adj[b].append(int(a))

        fwd = np.full((n, 4), -1, np.int32)
        for a in range(n):
            for b in adj[a]:
                d = points[b] - points[a]
                # mesh-convention compass direction, reference simulator.py:507
                direction = int(np.round(np.degrees(np.arctan2(d[2], d[0])))) % 360
                if direction % 90 != 0:
                    continue  # diagonal edges are not walkable by FORWARD
                # FORWARD at rotation r goes to the neighbor whose direction
                # equals the orientation (270 - r) % 360  (simulator.py:508)
                rot_idx = ((270 - direction) % 360) // 90
                fwd[a, rot_idx] = b

        hops, parent = _all_pairs_bfs(n, adj)
        oracle = _oracle_actions(points, fwd, hops, parent)
        return cls(points, fwd, hops, oracle, grid_size)

    @classmethod
    def grid(
        cls,
        width: int,
        depth: int,
        grid_size: float = 0.5,
        obstacle_fraction: float = 0.0,
        seed: int = 0,
    ) -> "SceneGraph":
        """Synthetic rectangular scene on the x-z plane (y = 0), optionally
        with random obstacle cells removed; the largest connected component is
        kept (mirroring how real scans yield one walkable component)."""
        rng = np.random.default_rng(seed)
        keep = np.ones((width, depth), bool)
        if obstacle_fraction > 0:
            keep &= rng.random((width, depth)) > obstacle_fraction
        ids = -np.ones((width, depth), np.int64)
        pts, edges = [], []
        for i in range(width):
            for j in range(depth):
                if keep[i, j]:
                    ids[i, j] = len(pts)
                    pts.append((i * grid_size, 0.0, j * grid_size))
        for i in range(width):
            for j in range(depth):
                if ids[i, j] < 0:
                    continue
                if i + 1 < width and ids[i + 1, j] >= 0:
                    edges.append((ids[i, j], ids[i + 1, j]))
                if j + 1 < depth and ids[i, j + 1] >= 0:
                    edges.append((ids[i, j], ids[i, j + 1]))
        g = cls.from_edges(np.array(pts, np.float32), np.array(edges), grid_size)
        return g.largest_component()

    @classmethod
    def from_metadata(cls, metadata_dir: str, grid_size: float = 0.5) -> "SceneGraph":
        """Load the reference's per-scene metadata: `graph.pkl` is a pickled
        networkx graph whose nodes carry `point` coords
        (soundspaces/utils.py:15-39). Node ids may be NON-contiguous (the
        reference's adjust_graph removes nodes, generate_replica_metadata.py:
        20-58) — they are densified here and preserved in `node_ids` so RIR
        filenames keyed by original id still resolve."""
        import os

        with open(os.path.join(metadata_dir, "graph.pkl"), "rb") as f:
            g = pickle.load(f)
        nodes = sorted(g.nodes())
        remap = {orig: row for row, orig in enumerate(nodes)}
        points = np.array([g.nodes[i]["point"] for i in nodes], np.float32)
        edges = np.array(
            [(remap[a], remap[b]) for a, b in g.edges()], np.int64
        ).reshape(-1, 2)
        out = cls.from_edges(points, edges, grid_size)
        out.node_ids = np.array(nodes, np.int64)
        return out

    def largest_component(self) -> "SceneGraph":
        n = self.num_nodes
        reach = self.geodesic_hops < UNREACHABLE
        best = np.argmax(reach.sum(1))
        keep = np.where(reach[best])[0]
        remap = -np.ones(n, np.int64)
        remap[keep] = np.arange(len(keep))
        fwd = self.forward_neighbor[keep]
        fwd = np.where(fwd >= 0, remap[np.maximum(fwd, 0)], -1).astype(np.int32)
        # oracle_action stores node IDS — remap values, not just slice
        oracle = self.oracle_action[np.ix_(keep, keep)]
        oracle = np.where(
            oracle >= 0, remap[np.maximum(oracle, 0)], -1
        ).astype(np.int16)
        return SceneGraph(
            self.points[keep],
            fwd,
            self.geodesic_hops[np.ix_(keep, keep)],
            oracle,
            self.grid_size,
            node_ids=self.node_ids[keep],
        )


def _all_pairs_bfs(n: int, adj: list[list[int]]):
    """Unweighted all-pairs shortest paths; returns (hops [N,N] int16,
    parent [N,N] int32) where parent[g, v] is the BFS predecessor of v in the
    tree rooted at g (i.e. the next hop from v toward g).

    Vectorized via scipy.sparse.csgraph in root-chunks so 10k+-node MP3D
    scenes build in seconds and the resident table is int16 (the survey's
    10k-node scene then costs 2 x 200 MB instead of 2 x 400 MB; node ids and
    hop counts both fit in int16 — UNREACHABLE is 2^15 - 1)."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import breadth_first_order  # noqa: F401 (doc)
    from scipy.sparse.csgraph import shortest_path

    assert n < 2**15, "int16 node-id tables cap scenes at 32767 nodes"
    rows = np.repeat(
        np.arange(n, dtype=np.int64), [len(a) for a in adj]
    )
    cols = np.concatenate([np.asarray(a, np.int64) for a in adj]) if n else (
        np.zeros(0, np.int64)
    )
    g = csr_matrix(
        (np.ones(rows.shape[0], np.int8), (rows, cols)), shape=(n, n)
    )
    hops = np.full((n, n), UNREACHABLE, np.int16)
    parent = np.full((n, n), -1, np.int32)
    chunk = 1024
    for lo in range(0, n, chunk):
        roots = np.arange(lo, min(lo + chunk, n))
        dist, pred = shortest_path(
            g, method="D", unweighted=True, indices=roots,
            return_predecessors=True,
        )
        reach = np.isfinite(dist)
        hops[roots] = np.where(reach, dist, float(UNREACHABLE)).astype(np.int16)
        parent[roots] = np.where(pred >= 0, pred, -1).astype(np.int32)
    return hops, parent


def _oracle_actions(points, fwd, hops, parent):
    """oracle[v*4 + r, g] packed as [N, 4, N]? Keep it simple: [N, N] of the
    next node toward g, converted to an action at runtime would need the
    rotation; instead store the next-hop NODE and derive turn/forward on
    device. Here we store the next-hop node index (-1 at goal/unreachable)."""
    n = points.shape[0]
    nxt = parent.T.copy()  # next_hop[v, g] = parent[g, v]
    np.fill_diagonal(nxt, -1)
    return nxt.astype(np.int16)
