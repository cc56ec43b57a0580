"""Dataset loading: reference gzip-JSON format round-trips into EpisodeBank."""

import gzip
import json
import os

import numpy as np

from soundspaces_tpu.datasets import AudioNavDataset, episodes_to_bank
from soundspaces_tpu.datasets.audionav import quat_to_rot_idx
from soundspaces_tpu.scene import make_synthetic_assets


def rot_quat(deg):
    rad = np.deg2rad(deg)
    return [0.0, float(np.sin(rad / 2)), 0.0, float(np.cos(rad / 2))]


def write_dataset(tmp_path, assets):
    g, ac = assets.graph, assets.acoustics
    goals = np.asarray(ac.goal_nodes)
    episodes = []
    for i in range(6):
        s = int((i * 3) % g.num_nodes)
        goal = int(goals[i % len(goals)])
        episodes.append(
            {
                "episode_id": str(i),
                "scene_id": "replica/apartment_0/habitat/mesh_semantic.ply",
                "start_position": [float(x) for x in g.points[s]],
                "start_rotation": rot_quat(90 * (i % 4)),
                "goals": [
                    {"position": [float(x) for x in g.points[goal]], "radius": 1e-5}
                ],
                "info": {
                    "geodesic_distance": float(g.geodesic_distance(s, goal)),
                    "num_action": 7,
                    "sound": "telephone",
                },
            }
        )
    split_dir = tmp_path / "train"
    content = split_dir / "content"
    os.makedirs(content)
    with gzip.open(split_dir / "train.json.gz", "wt") as f:
        json.dump({"episodes": []}, f)
    with gzip.open(content / "apartment_0.json.gz", "wt") as f:
        json.dump({"episodes": episodes}, f)
    return str(split_dir / "train.json.gz")


def test_load_and_bank_roundtrip(tmp_path):
    assets = make_synthetic_assets(num_nodes_hint=30, sampling_rate=4000,
                                   rir_max_len=800, image_size=8)
    path = write_dataset(tmp_path, assets)
    ds = AudioNavDataset.from_split(path)
    assert len(ds.episodes) == 6

    bank = episodes_to_bank(
        ds.episodes, assets.graph, assets.acoustics, {"telephone": 0}
    )
    assert bank.num_episodes == 6
    np.testing.assert_array_equal(np.asarray(bank.oracle_num_action), 7)
    # goal nodes resolve to valid RIR slots
    slots = np.asarray(bank.goal_slot)
    assert (slots >= 0).all()
    goals = np.asarray(assets.acoustics.goal_nodes)[slots]
    np.testing.assert_array_equal(goals, np.asarray(bank.goal_node))
    # start rotations decoded from quaternions
    assert list(np.asarray(bank.start_rot_idx)) == [0, 1, 2, 3, 0, 1]


def test_filters(tmp_path):
    assets = make_synthetic_assets(num_nodes_hint=30, sampling_rate=4000,
                                   rir_max_len=800, image_size=8)
    path = write_dataset(tmp_path, assets)
    ds = AudioNavDataset.from_split(path)
    ds.filter_by_ids(["apartment_0,2", "apartment_0,4"])
    assert [e.episode_id for e in ds.episodes] == ["2", "4"]

    ds2 = AudioNavDataset.from_split(path)
    ds2.filter_by_scenes("apartment_0")
    assert len(ds2.episodes) == 6
    ds2.filter_by_scenes("office_3")
    assert len(ds2.episodes) == 0


def test_quat_to_rot_idx():
    for deg, idx in [(0, 0), (90, 1), (180, 2), (270, 3)]:
        assert quat_to_rot_idx(rot_quat(deg)) == idx


def test_view_points_resolution_and_success(tmp_path):
    """SemanticAudioGoal view_points resolve to nearest graph nodes and STOP
    at a view point counts as success (semantic_audionav_task.py:28-46)."""
    import jax
    import jax.numpy as jnp

    from soundspaces_tpu.env import AudioNavEnv, DeviceScene, EnvConfig
    from soundspaces_tpu.scene import make_synthetic_assets
    from soundspaces_tpu.scene.graph import STOP

    assets = make_synthetic_assets(
        num_nodes_hint=24, sampling_rate=4000, rir_max_len=600, image_size=8,
        seed=21,
    )
    g, ac = assets.graph, assets.acoustics
    goal = int(np.asarray(ac.goal_nodes)[0])
    # a neighbor of the goal acts as the object's view point
    vp = next(int(n) for n in g.forward_neighbor[goal] if n >= 0)
    episodes = [{
        "episode_id": "0",
        "scene_id": "apartment_0",
        "start_position": [float(x) for x in g.points[vp]],
        "start_rotation": rot_quat(0),
        "goals": [{
            "position": [float(x) for x in g.points[goal]],
            "radius": 1e-5,
            "view_points": [
                {"agent_state": {"position": [float(x) for x in g.points[vp]]},
                 "iou": 0.5},
            ],
        }],
        "info": {"geodesic_distance": float(g.geodesic_distance(vp, goal)),
                 "num_action": 2, "sound": "telephone"},
    }]
    split_dir = tmp_path / "val"
    content = split_dir / "content"
    os.makedirs(content)
    with gzip.open(split_dir / "val.json.gz", "wt") as f:
        json.dump({"episodes": []}, f)
    with gzip.open(content / "apartment_0.json.gz", "wt") as f:
        json.dump({"episodes": episodes}, f)

    ds = AudioNavDataset.from_split(str(split_dir / "val.json.gz"))
    bank = episodes_to_bank(ds.episodes, g, ac, {"telephone": 0})
    vps = np.asarray(bank.viewpoint_nodes[0])
    assert goal in vps and vp in vps

    env = AudioNavEnv(
        EnvConfig(sensors=("spectrogram",), episode_sampling="sequential"),
        DeviceScene.from_assets(assets), bank, num_envs=1,
    )
    state, _ = env.reset(jax.random.PRNGKey(0))
    assert int(state.node[0]) == vp
    # STOP at the view point (not the goal node): success
    _, _, _, done, info = env.step(state, jnp.zeros(1, jnp.int32) + STOP)
    assert bool(np.asarray(done)[0])
    assert float(np.asarray(info["success"])[0]) == 1.0
