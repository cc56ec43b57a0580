"""Writers for the reference's on-disk dataset layouts.

These serialize a scene built by this framework into exactly the formats the
upstream platform ships and our ingestion paths read back:

- metadata: `{dir}/{scene}/points.txt` + `graph.pkl` (pickled networkx graph
  whose nodes carry `point` coords — soundspaces/utils.py:15-39)
- RIRs: `binaural_rirs/{scene}/{angle}/{receiver}_{source}.wav` per azimuth
  angle in {0, 90, 180, 270} (soundspaces/simulator.py:614-618)
- source sounds: `sounds/{dir}/{name}.wav` mono wavs
  (simulator.py:595-600)
- episodes: `{split}/{split}.json.gz` with `{"episodes": []}` at the top
  plus per-scene `content/{scene}.json.gz`
  (soundspaces/datasets/audionav_dataset.py:28-165)
- frame cache: `scene_observations/{scene}.pkl` keyed `(node, angle)`
  (scripts/cache_observations.py:44-107)

Round-tripping through these files (write here, read back through
SceneGraph.from_metadata / AcousticBank.from_rir_dir /
AudioNavDataset.from_split / FrameBank.from_cache_pickle) is how the
framework proves reference-format compatibility without the 867 GB dataset.
"""

from __future__ import annotations

import gzip
import json
import os
import pickle

import numpy as np

from soundspaces_tpu.scene.graph import SceneGraph

ANGLES = (0, 90, 180, 270)


# --------------------------------------------------------------------- audio
def resample(wave: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resampling (the role librosa.load's resampler plays when the
    reference loads 44.1 kHz sounds against 16 kHz MP3D RIRs)."""
    from math import gcd

    from scipy.signal import resample_poly

    if sr_in == sr_out:
        return np.asarray(wave, np.float32)
    g = gcd(sr_in, sr_out)
    return resample_poly(
        np.asarray(wave, np.float64), sr_out // g, sr_in // g
    ).astype(np.float32)


def load_wav_mono(path: str, target_sr: int) -> np.ndarray:
    """Read any PCM/float wav as mono float32 in [-1, 1] at target_sr."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    data = np.asarray(data)
    if data.dtype.kind == "i":
        data = data.astype(np.float32) / np.iinfo(data.dtype).max
    elif data.dtype.kind == "u":
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    return resample(data, sr, target_sr)


def write_sound_dir(
    sounds: dict[str, np.ndarray], out_dir: str, sampling_rate: int
) -> None:
    """Write mono float32 wavs, padded to whole seconds (the discrete sim
    indexes sources by the second, simulator.py:630-640)."""
    from scipy.io import wavfile

    os.makedirs(out_dir, exist_ok=True)
    for name, wave in sounds.items():
        wave = np.asarray(wave, np.float32)
        secs = max(-(-wave.shape[0] // sampling_rate), 1)
        padded = np.zeros(secs * sampling_rate, np.float32)
        padded[: wave.shape[0]] = wave
        wavfile.write(
            os.path.join(out_dir, f"{name}.wav"), sampling_rate, padded
        )


def write_binaural_rirs(
    rirs: np.ndarray,  # [4, N, G, 2, L] float32
    goal_nodes: np.ndarray,  # [G] node id per goal slot
    out_dir: str,
    sampling_rate: int,
    trim_silence: bool = True,
) -> int:
    """Write the reference RIR layout `{angle}/{receiver}_{source}.wav`
    (float32 stereo wavs; the reference reads them with scipy wavfile.read,
    simulator.py:614-618). Trailing near-silence is trimmed per file like
    real rendered RIRs, which vary in length. Returns files written."""
    from scipy.io import wavfile

    goal_nodes = np.asarray(goal_nodes)
    count = 0
    for ai, angle in enumerate(ANGLES):
        adir = os.path.join(out_dir, str(angle))
        os.makedirs(adir, exist_ok=True)
        for r in range(rirs.shape[1]):
            for gi, s in enumerate(goal_nodes):
                data = rirs[ai, r, gi]  # [2, L]
                ln = data.shape[1]
                if trim_silence:
                    peak = np.abs(data).max()
                    if peak > 0:
                        sig = np.abs(data).max(axis=0) > 1e-5 * peak
                        nz = np.nonzero(sig)[0]
                        ln = int(nz[-1]) + 1 if nz.size else 1
                wavfile.write(
                    os.path.join(adir, f"{r}_{int(s)}.wav"),
                    sampling_rate,
                    np.ascontiguousarray(data[:, :ln].T),
                )
                count += 1
    return count


# ------------------------------------------------------------------ metadata
def write_metadata(graph: SceneGraph, out_dir: str) -> None:
    """points.txt (index x y z per line) + graph.pkl (networkx, node attr
    `point`) — the exact files load_metadata reads (utils.py:15-39)."""
    import networkx as nx

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "points.txt"), "w") as f:
        for i, p in enumerate(graph.points):
            f.write(f"{i}\t{p[0]:.6f}\t{p[1]:.6f}\t{p[2]:.6f}\n")
    g = nx.Graph()
    for i, p in enumerate(graph.points):
        g.add_node(i, point=tuple(float(v) for v in p))
    n = graph.num_nodes
    for a in range(n):
        for r in range(4):
            b = int(graph.forward_neighbor[a, r])
            if b >= 0:
                g.add_edge(a, b)
    with open(os.path.join(out_dir, "graph.pkl"), "wb") as f:
        pickle.dump(g, f)


# ------------------------------------------------------------------ episodes
def _rot_quaternion(rot_idx: int) -> list[float]:
    """[x, y, z, w] quaternion for a rotation of 90*rot_idx degrees about +Y
    (inverse of datasets.audionav.quat_to_rot_idx)."""
    theta = np.deg2rad(90.0 * rot_idx)
    return [0.0, float(np.sin(theta / 2)), 0.0, float(np.cos(theta / 2))]


def make_episode_records(
    graph: SceneGraph,
    goal_nodes: np.ndarray,
    sound_names: list[str],
    num_episodes: int,
    scene_id: str,
    seed: int = 0,
    min_hops: int = 4,
    max_hops: int = 60,
) -> list[dict]:
    """Sample episode dicts in the reference's JSON schema: start pose, goal
    position+radius, info {geodesic_distance, num_action, sound}
    (audionav_dataset.py:28-165; num_action via compute_oracle_actions,
    simulator.py:725-751)."""
    from soundspaces_tpu.env.structs import _oracle_num_actions

    rng = np.random.default_rng(seed)
    goal_nodes = np.asarray(goal_nodes)
    out = []
    guard = 0
    while len(out) < num_episodes and guard < num_episodes * 200:
        guard += 1
        gi = int(rng.integers(0, len(goal_nodes)))
        goal = int(goal_nodes[gi])
        start = int(rng.integers(0, graph.num_nodes))
        hops = int(graph.geodesic_hops[start, goal])
        if hops < min_hops or hops > max_hops:
            continue
        rot = int(rng.integers(0, 4))
        sound = sound_names[int(rng.integers(0, len(sound_names)))]
        out.append(
            {
                "episode_id": str(len(out)),
                "scene_id": f"{scene_id}/{scene_id}.glb",
                "start_position": [float(v) for v in graph.points[start]],
                "start_rotation": _rot_quaternion(rot),
                "goals": [
                    {
                        "position": [float(v) for v in graph.points[goal]],
                        "radius": 1e-5,
                    }
                ],
                "info": {
                    "geodesic_distance": hops * graph.grid_size,
                    "num_action": _oracle_num_actions(graph, start, rot, goal),
                    "sound": sound,
                },
            }
        )
    assert len(out) == num_episodes, (
        f"only sampled {len(out)}/{num_episodes} episodes in hop range "
        f"[{min_hops}, {max_hops}]"
    )
    return out


def make_semantic_episode_records(
    graph: SceneGraph,
    goal_nodes: np.ndarray,
    goal_categories: list[str],
    sounds_by_category: dict[str, list[str]],
    sound_secs: dict[str, int],
    num_episodes: int,
    scene_id: str,
    seed: int = 0,
    min_hops: int = 4,
    max_hops: int = 60,
    distractor_prob: float = 0.7,
    max_duration: int = 200,
) -> list[dict]:
    """Sample SemanticAudioNav episode dicts in the reference's JSON schema
    (semantic_audionav_task.py:29-97, semantic_audionav_dataset.py:143-217):
    top-level object_category / sound_id / offset / duration /
    distractor_sound_id / distractor_position_index, and goals carrying
    object_id, object_category and view_points. view_points entries are
    serialized agent-state positions (the released datasets store bare
    [x, y, z] lists that __deserialize_goal wraps into ObjectViewLocation,
    semantic_audionav_dataset.py:146-150).

    The sound voicing an episode is drawn from the clips of the GOAL
    OBJECT's category (many clips per category), so category != f(sound) —
    the belief task is real inference. The distractor rings from another
    goal node with a sound of THAT node's category."""
    from soundspaces_tpu.env.structs import _oracle_num_actions

    rng = np.random.default_rng(seed)
    goal_nodes = np.asarray(goal_nodes)
    out = []
    guard = 0
    while len(out) < num_episodes and guard < num_episodes * 200:
        guard += 1
        gi = int(rng.integers(0, len(goal_nodes)))
        goal = int(goal_nodes[gi])
        category = goal_categories[gi]
        start = int(rng.integers(0, graph.num_nodes))
        hops = int(graph.geodesic_hops[start, goal])
        if hops < min_hops or hops > max_hops:
            continue
        rot = int(rng.integers(0, 4))
        clips = sounds_by_category[category]
        sound = clips[int(rng.integers(0, len(clips)))]
        offset = int(rng.integers(0, max(sound_secs.get(sound, 1), 1)))
        duration = int(rng.integers(10, max_duration + 1))
        # view points: the goal plus its graph neighbors (navigable
        # positions around the object, SemanticAudioGoal.view_points)
        vp_nodes = [goal] + [
            int(b) for b in graph.forward_neighbor[goal] if int(b) >= 0
        ]
        view_points = [
            [float(v) for v in graph.points[n]] for n in sorted(set(vp_nodes))
        ]
        rec = {
            "episode_id": str(len(out)),
            "scene_id": f"{scene_id}/{scene_id}.glb",
            "start_position": [float(v) for v in graph.points[start]],
            "start_rotation": _rot_quaternion(rot),
            "object_category": category,
            "sound_id": sound,
            "offset": offset,
            "duration": duration,
            "goals": [
                {
                    "position": [float(v) for v in graph.points[goal]],
                    "radius": 1e-5,
                    "object_id": str(gi),
                    "object_category": category,
                    "view_points": view_points,
                }
            ],
            "info": {
                "geodesic_distance": hops * graph.grid_size,
                "num_action": _oracle_num_actions(graph, start, rot, goal),
                "sound": sound,
            },
        }
        if rng.random() < distractor_prob and len(goal_nodes) > 1:
            while True:
                di = int(rng.integers(0, len(goal_nodes)))
                if di != gi:
                    break
            d_clips = sounds_by_category[goal_categories[di]]
            rec["distractor_sound_id"] = d_clips[
                int(rng.integers(0, len(d_clips)))
            ]
            rec["distractor_position_index"] = int(goal_nodes[di])
        out.append(rec)
    assert len(out) == num_episodes, (
        f"only sampled {len(out)}/{num_episodes} semantic episodes in hop "
        f"range [{min_hops}, {max_hops}]"
    )
    return out


# ----------------------------------------------------------------- house file
def write_house_file(
    path: str,
    object_positions: np.ndarray,  # [O, 3]
    object_categories: list[str],  # [O] category names
    bbox_radius: float = 0.5,
) -> None:
    """Minimal MP3D `.house` annotation: `C` category-table lines and `O`
    object lines in the column layout scene/mp3d.HouseReader parses (the
    reference reads these via mp3d_utils.py:100-192 for semantic scenes).
    Category ids index the C table; object index i is the raster instance
    id i+1 (0 = background)."""
    from soundspaces_tpu.scene.mp3d import CATEGORY_TO_MPCAT40

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cats = sorted(set(object_categories))
    cat_id = {c: i for i, c in enumerate(cats)}
    with open(path, "w") as f:
        f.write("ASCII 1.0\n")
        for c in cats:
            # C category_index category_mapping_index category_mapping_name
            #   mpcat40_index mpcat40_name 0 0 0 0 0 (mp3d_utils.py:89)
            mp = CATEGORY_TO_MPCAT40.get(c, 41)  # 41 = mp3d 'unlabeled'
            f.write(f"C {cat_id[c]} {cat_id[c]} {c} {mp} {c} 0 0 0 0 0\n")
        for i, (pos, c) in enumerate(zip(object_positions, object_categories)):
            px, py, pz = (float(v) for v in pos)
            r = bbox_radius
            # O object_index region_index category_index px py pz a0x a0y a0z
            #   a1x a1y a1z r0 r1 r2 0... (mp3d_utils.py:90)
            f.write(
                f"O {i} 0 {cat_id[c]} {px:.4f} {py:.4f} {pz:.4f} "
                f"1 0 0 0 1 0 {r} {r} {r} 0 0 0 0 0 0 0 0\n"
            )


def write_episode_dataset(
    episodes_by_scene: dict[str, list[dict]], split_dir: str, split: str
) -> None:
    """`{split_dir}/{split}.json.gz` (empty top-level episode list, as the
    reference ships) + `content/{scene}.json.gz` per scene."""
    os.makedirs(split_dir, exist_ok=True)
    with gzip.open(os.path.join(split_dir, f"{split}.json.gz"), "wt") as f:
        f.write(json.dumps({"episodes": []}))
    content = os.path.join(split_dir, "content")
    os.makedirs(content, exist_ok=True)
    for scene, eps in episodes_by_scene.items():
        with gzip.open(os.path.join(content, f"{scene}.json.gz"), "wt") as f:
            f.write(json.dumps({"episodes": eps}))


# --------------------------------------------------------------- frame cache
def write_frame_cache(frames: dict[str, np.ndarray], path: str) -> None:
    """scene_observations pickle `{(node, angle): {sensor: array}}`
    (scripts/cache_observations.py:44-107). frames: name -> [N, 4, H, W, C]."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cache: dict[tuple[int, int], dict[str, np.ndarray]] = {}
    any_arr = next(iter(frames.values()))
    for node in range(any_arr.shape[0]):
        for ai, angle in enumerate(ANGLES):
            cache[(node, angle)] = {
                name: np.asarray(arr[node, ai]) for name, arr in frames.items()
            }
    with open(path, "wb") as f:
        pickle.dump(cache, f)
