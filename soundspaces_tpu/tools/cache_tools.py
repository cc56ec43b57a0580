"""Dataset/cache writers: produce the reference's on-disk formats.

- write_observation_cache: the scripts/cache_observations.py job — render
  every (node, 4 angles) into `scene_observations/{scene}.pkl` keyed
  (node, angle) (cache_observations.py:44-107); here frames come from any
  FrameBank (synthetic renderer or ingested data).
- write_episode_dataset: emit AudioNav episode `*.json.gz` files in the
  loader's format, so synthetic worlds round-trip through the same dataset
  machinery real data uses.
- write_metadata: per-scene `points.txt` + `graph.pkl`
  (generate_{replica,matterport}_metadata.py role).
"""

from __future__ import annotations

import gzip
import json
import os
import pickle

import numpy as np

from soundspaces_tpu.scene.banks import FrameBank, SceneAssets
from soundspaces_tpu.scene.graph import SceneGraph


def write_observation_cache(frames: FrameBank, path: str) -> str:
    cache = {}
    any_mod = next(iter(frames.modalities.values()))
    n = any_mod.shape[0]
    for node in range(n):
        for rot in range(4):
            cache[(node, rot * 90)] = {
                name: np.asarray(arr[node, rot])
                for name, arr in frames.modalities.items()
            }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(cache, f)
    return path


def write_metadata(graph: SceneGraph, metadata_dir: str) -> None:
    """points.txt ('<idx> <x> <y> <z>' rows) + pickled networkx graph with
    `point` node attributes (soundspaces/utils.py:15-39 reads these)."""
    import networkx as nx

    os.makedirs(metadata_dir, exist_ok=True)
    with open(os.path.join(metadata_dir, "points.txt"), "w") as f:
        for i, p in enumerate(graph.points):
            f.write(f"{i}\t{p[0]}\t{p[1] - 1.5}\t{p[2]}\n")
    g = nx.Graph()
    for i, p in enumerate(graph.points):
        g.add_node(i, point=tuple(float(v) for v in p))
    for a in range(graph.num_nodes):
        for r in range(4):
            b = int(graph.forward_neighbor[a, r])
            if b >= 0:
                g.add_edge(a, b)
    with open(os.path.join(metadata_dir, "graph.pkl"), "wb") as f:
        pickle.dump(g, f)


def write_episode_dataset(
    assets: SceneAssets,
    out_dir: str,
    split: str,
    scene_name: str,
    num_episodes: int,
    sound_names: list[str],
    seed: int = 0,
) -> str:
    """Emit {split}/{split}.json.gz + content/{scene}.json.gz in the
    reference dataset layout (datasets/audionav.py loads these)."""
    from soundspaces_tpu.scene.graph import UNREACHABLE

    g, ac = assets.graph, assets.acoustics
    rng = np.random.default_rng(seed)
    episodes = []
    goals = np.asarray(ac.goal_nodes)
    i = 0
    while len(episodes) < num_episodes and i < num_episodes * 50:
        i += 1
        s = int(rng.integers(0, g.num_nodes))
        goal = int(goals[rng.integers(0, len(goals))])
        hops = int(g.geodesic_hops[s, goal])
        if hops < 1 or hops >= UNREACHABLE:
            continue
        deg = 90 * int(rng.integers(0, 4))
        rad = np.deg2rad(deg)
        episodes.append(
            {
                "episode_id": str(len(episodes)),
                "scene_id": f"synthetic/{scene_name}/mesh.ply",
                "start_position": [float(x) for x in g.points[s]],
                "start_rotation": [
                    0.0, float(np.sin(rad / 2)), 0.0, float(np.cos(rad / 2))
                ],
                "goals": [
                    {
                        "position": [float(x) for x in g.points[goal]],
                        "radius": 1e-5,
                    }
                ],
                "info": {
                    "geodesic_distance": hops * g.grid_size,
                    "num_action": 0,
                    "sound": sound_names[int(rng.integers(0, len(sound_names)))],
                },
            }
        )
    split_dir = os.path.join(out_dir, split)
    os.makedirs(os.path.join(split_dir, "content"), exist_ok=True)
    with gzip.open(os.path.join(split_dir, f"{split}.json.gz"), "wt") as f:
        json.dump({"episodes": []}, f)
    with gzip.open(
        os.path.join(split_dir, "content", f"{scene_name}.json.gz"), "wt"
    ) as f:
        json.dump({"episodes": episodes}, f)
    return os.path.join(split_dir, f"{split}.json.gz")
