"""AudioNav episode dataset: reads the reference's on-disk format and
compiles episodes into the device EpisodeBank.

Reference format (soundspaces/datasets/audionav_dataset.py:28-165):
- a global split file `{split}/{split}.json.gz` containing
  `{"episodes": [...]}` (often empty at the top level), plus per-scene
  `content/{scene}.json.gz` files;
- each episode: episode_id, scene_id, start_position [3], start_rotation
  [x,y,z,w] quaternion, goals [{position, radius}], and info
  {geodesic_distance, num_action, sound}.

Instead of keeping 10^4 Python episode objects alive per worker process, the
loader resolves positions to graph node ids once (via the reference's 2-dp
position encoding, simulator.py:438-446) and emits parallel arrays.
"""

from __future__ import annotations

import dataclasses
import gzip
import json
import os
from typing import Iterable, Sequence

import numpy as np

from soundspaces_tpu.env.structs import EpisodeBank
from soundspaces_tpu.scene.banks import AcousticBank
from soundspaces_tpu.scene.graph import SceneGraph


@dataclasses.dataclass
class Episode:
    episode_id: str
    scene_id: str
    start_position: list[float]
    start_rotation: list[float]  # [x, y, z, w]
    goals: list[dict]
    info: dict
    start_room: str | None = None
    shortest_paths: list | None = None
    # semantic-audionav extras (semantic_audionav_task.py:28-46)
    object_category: str | None = None
    sound_id: str | None = None
    offset: int = 0
    duration: int = 500
    distractor_sound_id: str | None = None
    distractor_position_index: int | None = None


class AudioNavDataset:
    """Host-side dataset: list of Episode records + filters."""

    def __init__(self, episodes: list[Episode] | None = None):
        self.episodes: list[Episode] = episodes or []

    # ------------------------------------------------------------------ load
    @classmethod
    def from_split(
        cls,
        data_path: str,
        content_scenes: Sequence[str] = ("*",),
    ) -> "AudioNavDataset":
        """data_path: the split's json.gz; per-scene content files are
        discovered next to it under content/."""
        ds = cls()
        ds._load_file(data_path)
        dataset_dir = os.path.dirname(data_path)
        content_dir = os.path.join(dataset_dir, "content")
        scenes = list(content_scenes)
        if "*" in scenes and os.path.isdir(content_dir):
            scenes = sorted(
                f[: -len(".json.gz")]
                for f in os.listdir(content_dir)
                if f.endswith(".json.gz")
            )
        for scene in scenes:
            if scene == "*":
                continue
            ds._load_file(os.path.join(content_dir, f"{scene}.json.gz"))
        return ds

    def _load_file(self, path: str):
        if not os.path.exists(path):
            return
        with gzip.open(path, "rt") as f:
            payload = json.loads(f.read())
        known = {f.name for f in dataclasses.fields(Episode)}
        for raw in payload.get("episodes", []):
            unknown = set(raw) - known
            assert not unknown, (
                f"{path}: episode {raw.get('episode_id')} carries unknown "
                f"fields {sorted(unknown)} — extend datasets.audionav.Episode "
                "rather than dropping them silently (schema mismatches on "
                "real semantic datasets must fail loudly)"
            )
            self.episodes.append(Episode(**raw))

    # --------------------------------------------------------------- filters
    def filter_by_ids(self, scene_episode_ids: Iterable[str]) -> None:
        """ids like "{scene},{episode_id}" (audionav_dataset.py:112-122)."""
        keep = []
        pairs = [s.split(",") for s in scene_episode_ids]
        for ep in self.episodes:
            for scene, ep_id in pairs:
                if scene in ep.scene_id and ep_id == str(ep.episode_id):
                    keep.append(ep)
                    break
        self.episodes = keep

    def filter_by_scenes(self, scene: str) -> None:
        self.episodes = [
            ep for ep in self.episodes if scene in ep.scene_id
        ]


def quat_to_rot_idx(q: Sequence[float]) -> int:
    """[x, y, z, w] rotation about +Y -> rotation angle / 90 (the reference's
    quat_to_angle_axis conversion, simulator.py:406-407)."""
    x, y, z, w = q
    angle = 2.0 * np.arctan2(y, w)
    deg = int(np.round(np.degrees(angle))) % 360
    assert deg % 90 == 0, f"non-cardinal start rotation {deg}"
    return deg // 90


def episodes_to_bank(
    episodes: Sequence[Episode],
    graph: SceneGraph,
    acoustics: AcousticBank,
    sound_to_id: dict[str, int],
    category_to_id: dict[str, int] | None = None,
) -> EpisodeBank:
    """Resolve episode records against one scene's graph + RIR bank."""
    import jax.numpy as jnp

    enc = lambda p: "{:.2f}_{:.2f}_{:.2f}".format(*p)
    node_of = {enc(p): i for i, p in enumerate(graph.points)}

    n = len(episodes)
    start_node = np.zeros(n, np.int32)
    start_rot = np.zeros(n, np.int32)
    goal_node = np.zeros(n, np.int32)
    goal_slot = np.zeros(n, np.int32)
    sound_id = np.zeros(n, np.int32)
    geodesic = np.zeros(n, np.float32)
    num_action = np.zeros(n, np.int32)
    duration = np.full(n, 500, np.int32)
    offset = np.zeros(n, np.int32)
    category = np.zeros(n, np.int32)
    d_sound = np.full(n, -1, np.int32)
    d_slot = np.full(n, -1, np.int32)
    # goal view points -> nearest graph nodes (SemanticAudioGoal.view_points;
    # the CONTINUOUS +0.1 height nudge, audionav_dataset.py:160-162, is a
    # mesh-snapping artifact with no graph equivalent)
    vp_lists: list[list[int]] = []

    def nearest_node(pos) -> int:
        # full 3-D distance: xz-only matching would snap a view point to the
        # node directly below/above it on another floor of a multi-story
        # scene and grant success on the wrong floor
        d = np.linalg.norm(graph.points - np.asarray(pos, np.float32), axis=1)
        return int(np.argmin(d))

    for i, ep in enumerate(episodes):
        start_node[i] = node_of[enc(ep.start_position)]
        start_rot[i] = quat_to_rot_idx(ep.start_rotation)
        g = node_of[enc(ep.goals[0]["position"])]
        goal_node[i] = g
        slot = int(acoustics.goal_slot_of_node[g])
        if slot < 0:
            raise KeyError(
                f"episode {ep.episode_id}: goal node {g} has no RIR goal slot"
            )
        goal_slot[i] = slot
        sound = ep.info.get("sound", ep.sound_id)
        sound_id[i] = sound_to_id[sound]
        geodesic[i] = ep.info.get(
            "geodesic_distance", graph.geodesic_distance(start_node[i], g)
        )
        num_action[i] = ep.info.get("num_action", 0)
        duration[i] = ep.duration
        offset[i] = ep.offset
        if category_to_id and ep.object_category:
            category[i] = category_to_id[ep.object_category]
        else:
            category[i] = sound_id[i] % 21
        # semantic-task distractor (semantic_audionav_task.py:28-46)
        if ep.distractor_sound_id is not None:
            d_sound[i] = sound_to_id[ep.distractor_sound_id]
        if ep.distractor_position_index is not None:
            # an ORIGINAL graph.pkl node id (the simulator passes it straight
            # to the RIR filename, semantic_audionav_task.py:204-205) —
            # resolve to a dense row like discover_goal_nodes does
            ids = np.asarray(graph.node_ids, np.int64)
            row = int(np.searchsorted(ids, int(ep.distractor_position_index)))
            assert row < len(ids) and ids[row] == int(
                ep.distractor_position_index
            ), f"distractor node {ep.distractor_position_index} not in graph"
            d_slot[i] = int(acoustics.goal_slot_of_node[row])
        vps = [g]
        for vp in ep.goals[0].get("view_points") or []:
            # on disk a view point is a bare [x, y, z] agent-state position
            # (ObjectViewLocation(view, ...) wraps it at load,
            # semantic_audionav_dataset.py:146-150); accept the wrapped
            # {agent_state: {position}} dict form too
            if isinstance(vp, dict):
                pos = (vp.get("agent_state") or {}).get("position")
            else:
                pos = vp
            if pos is not None:
                vps.append(nearest_node(pos))
        vp_lists.append(sorted(set(vps)))

    v_max = max(len(v) for v in vp_lists) if vp_lists else 1
    viewpoints = np.full((n, v_max), -1, np.int32)
    for i, v in enumerate(vp_lists):
        viewpoints[i, : len(v)] = v

    return EpisodeBank(
        viewpoint_nodes=jnp.asarray(viewpoints),
        start_node=jnp.asarray(start_node),
        start_rot_idx=jnp.asarray(start_rot),
        goal_node=jnp.asarray(goal_node),
        goal_slot=jnp.asarray(goal_slot),
        sound_id=jnp.asarray(sound_id),
        geodesic=jnp.asarray(geodesic),
        oracle_num_action=jnp.asarray(num_action),
        duration_sec=jnp.asarray(duration),
        offset_sec=jnp.asarray(offset),
        category=jnp.asarray(category),
        distractor_sound_id=jnp.asarray(d_sound),
        distractor_slot=jnp.asarray(d_slot),
    )
