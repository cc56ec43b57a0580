"""Procedural multi-room floorplans at Replica/MP3D scale.

The reference's scenes are scanned apartments whose navigation graphs are
grids of 0.5 m-spaced walkable points spanning multiple rooms joined by
doorways (soundspaces/utils.py:15-39; metadata built by
scripts/generate_replica_metadata.py). Real scans are not shippable, so this
module generates worlds with the same *structure*: a recursive-division
floorplan — rooms separated by walls, connected through door gaps — whose
walkable cells become a 1000+-node SceneGraph. These are the "realistic
Replica-class" scenes used for full-stack validation at reference scale.
"""

from __future__ import annotations

import numpy as np

from soundspaces_tpu.scene.graph import SceneGraph


def recursive_division(
    width: int,
    depth: int,
    rng: np.random.Generator,
    min_room: int = 5,
    door_width: int = 2,
) -> np.ndarray:
    """Boolean walkable grid [depth, width]: recursively split open space
    with 1-cell walls, leaving a `door_width`-cell doorway per wall."""
    walkable = np.ones((depth, width), bool)

    def split(z0: int, z1: int, x0: int, x1: int):
        h, w = z1 - z0, x1 - x0
        if h < 2 * min_room + 1 and w < 2 * min_room + 1:
            return
        # split the longer axis (randomize on ties)
        vertical = w > h or (w == h and rng.random() < 0.5)
        if vertical and w < 2 * min_room + 1:
            vertical = False
        if not vertical and h < 2 * min_room + 1:
            vertical = True
        if vertical:
            xw = int(rng.integers(x0 + min_room, x1 - min_room))
            walkable[z0:z1, xw] = False
            d0 = int(rng.integers(z0, z1 - door_width + 1))
            walkable[d0 : d0 + door_width, xw] = True
            split(z0, z1, x0, xw)
            split(z0, z1, xw + 1, x1)
        else:
            zw = int(rng.integers(z0 + min_room, z1 - min_room))
            walkable[zw, x0:x1] = False
            d0 = int(rng.integers(x0, x1 - door_width + 1))
            walkable[zw, d0 : d0 + door_width] = True
            split(z0, zw, x0, x1)
            split(zw + 1, z1, x0, x1)

    split(0, depth, 0, width)
    return walkable


def floorplan_graph(
    width: int = 40,
    depth: int = 40,
    grid_size: float = 0.5,
    seed: int = 0,
    min_room: int = 5,
    clutter_fraction: float = 0.03,
) -> SceneGraph:
    """Multi-room navigation graph: recursive-division rooms + doorways,
    plus sparse in-room clutter (furniture-like blocked cells). The largest
    connected component is kept, as real scan metadata does."""
    rng = np.random.default_rng(seed)
    keep = recursive_division(width, depth, rng, min_room=min_room)
    if clutter_fraction > 0:
        clutter = rng.random(keep.shape) < clutter_fraction
        keep &= ~clutter
    ids = -np.ones((depth, width), np.int64)
    pts, edges = [], []
    for z in range(depth):
        for x in range(width):
            if keep[z, x]:
                ids[z, x] = len(pts)
                pts.append((x * grid_size, 0.0, z * grid_size))
    for z in range(depth):
        for x in range(width):
            if ids[z, x] < 0:
                continue
            if x + 1 < width and ids[z, x + 1] >= 0:
                edges.append((ids[z, x], ids[z, x + 1]))
            if z + 1 < depth and ids[z + 1, x] >= 0:
                edges.append((ids[z, x], ids[z + 1, x]))
    g = SceneGraph.from_edges(
        np.array(pts, np.float32), np.array(edges, np.int64), grid_size
    )
    return g.largest_component()


def spread_goal_nodes(
    graph: SceneGraph, num_goals: int, seed: int = 0
) -> np.ndarray:
    """Farthest-point-sampled goal (source) nodes so goals land in distinct
    rooms — mirroring how reference episode goals (telephone positions etc.)
    are distributed across an apartment rather than clustered."""
    rng = np.random.default_rng(seed)
    hops = graph.geodesic_hops.astype(np.float32)
    first = int(rng.integers(0, graph.num_nodes))
    chosen = [first]
    d = hops[first].copy()
    for _ in range(num_goals - 1):
        d[np.asarray(chosen)] = -1.0
        nxt = int(np.argmax(np.where(np.isfinite(d), d, -1.0)))
        chosen.append(nxt)
        d = np.minimum(d, hops[nxt])
    return np.sort(np.asarray(chosen, np.int32))
