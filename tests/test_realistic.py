"""The realistic-world pipeline: floorplan generation, reference-format
serialization (metadata/RIR-wavs/sounds/episodes/frame-cache), ingestion
exclusively through the reference loaders, and end-to-end stepping.

This is the round-trip proof that the framework consumes the upstream
platform's dataset layouts (soundspaces/utils.py:15-39, simulator.py:614-618,
datasets/audionav_dataset.py:28-165, scripts/cache_observations.py)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundspaces_tpu.scene.floorplan import floorplan_graph, spread_goal_nodes


def test_floorplan_is_multi_room_and_connected():
    g = floorplan_graph(24, 24, seed=0)
    assert g.num_nodes > 300
    from soundspaces_tpu.scene.graph import UNREACHABLE

    # connected: every pair reachable
    assert int(g.geodesic_hops.max()) < int(UNREACHABLE)
    # multi-room: some node pair's geodesic is much longer than euclidean
    # (walls force detours through doors)
    pts = g.points
    hops = g.geodesic_hops.astype(np.float32) * g.grid_size
    eu = np.linalg.norm(pts[:, None, [0, 2]] - pts[None, :, [0, 2]], axis=-1)
    ratio = hops / np.maximum(eu, 1e-6)
    assert float(ratio.max()) > 1.6, "no wall detours -> not multi-room"


def test_spread_goals_are_far_apart():
    g = floorplan_graph(24, 24, seed=1)
    goals = spread_goal_nodes(g, 6, seed=2)
    assert len(set(int(x) for x in goals)) == 6
    hops = g.geodesic_hops[np.ix_(goals, goals)].astype(np.int32)
    off = hops[~np.eye(6, dtype=bool)]
    assert off.min() >= 4, "farthest-point goals should not be adjacent"


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from soundspaces_tpu.tools.make_realistic import build_world

    out = str(tmp_path_factory.mktemp("realworld"))
    summary = build_world(
        out, scene="tiny", width=12, depth=12, num_goals=3,
        sampling_rate=4000, rir_max_len=800, num_rays=60,
        train_episodes=30, val_episodes=8, test_episodes=8,
        image_size=16, seed=0,
    )
    return out, summary


def test_world_layout_on_disk(world):
    out, summary = world
    assert os.path.exists(os.path.join(out, "metadata", "tiny", "graph.pkl"))
    assert os.path.exists(os.path.join(out, "metadata", "tiny", "points.txt"))
    assert os.path.exists(os.path.join(out, "sounds", "1s_all", "telephone.wav"))
    assert os.path.exists(
        os.path.join(out, "datasets", "audionav", "tiny", "train",
                     "train.json.gz")
    )
    assert os.path.exists(
        os.path.join(out, "datasets", "audionav", "tiny", "train", "content",
                     "tiny.json.gz")
    )
    # RIR layout: {angle}/{receiver}_{source}.wav
    some = os.listdir(os.path.join(out, "binaural_rirs", "tiny", "90"))
    assert all(f.endswith(".wav") and "_" in f for f in some)
    assert summary["rir_files"] == 4 * summary["num_nodes"] * 3


def test_rir_wav_round_trip_exact(world):
    """Written wav -> from_rir_dir bank row must be bit-exact (float32 wavs,
    no int rescaling) up to the trailing-silence trim."""
    from scipy.io import wavfile

    from soundspaces_tpu.builder import discover_goal_nodes
    from soundspaces_tpu.scene.banks import AcousticBank
    from soundspaces_tpu.scene.graph import SceneGraph

    out, _ = world
    g = SceneGraph.from_metadata(os.path.join(out, "metadata", "tiny"))
    rir_dir = os.path.join(out, "binaural_rirs", "tiny")
    goals = discover_goal_nodes(rir_dir, g)
    sounds = np.zeros((1, 4000), np.float32)
    ac = AcousticBank.from_rir_dir(
        g, rir_dir, goals, sounds, np.ones(1, np.int32), 4000, 800
    )
    _, data = wavfile.read(os.path.join(rir_dir, "180", f"5_{goals[0]}.wav"))
    row = np.asarray(ac.rir[2, 5, 0])  # azimuth 180 -> index 2
    np.testing.assert_array_equal(row[:, : data.shape[0]], data.T)
    assert np.all(row[:, data.shape[0]:] == 0)


def test_full_ingestion_and_oracle(world):
    out, _ = world
    from soundspaces_tpu.builder import discover_goal_nodes, load_source_sounds
    from soundspaces_tpu.datasets import AudioNavDataset, episodes_to_bank
    from soundspaces_tpu.env import AudioNavEnv, DeviceScene
    from soundspaces_tpu.env.audionav import EnvConfig
    from soundspaces_tpu.eval.agents import OracleAgent
    from soundspaces_tpu.scene.banks import (
        AcousticBank,
        FrameBank,
        SceneAssets,
    )
    from soundspaces_tpu.scene.graph import SceneGraph

    g = SceneGraph.from_metadata(os.path.join(out, "metadata", "tiny"))
    sounds, names, lengths = load_source_sounds(
        os.path.join(out, "sounds", "1s_all"), 4000
    )
    assert names == ["fan", "singing", "telephone"]
    # true per-sound durations, not the padded max (fan 3 s, telephone 2 s)
    assert lengths.tolist()[0] == 3 and lengths.tolist()[2] == 2
    rir_dir = os.path.join(out, "binaural_rirs", "tiny")
    goals = discover_goal_nodes(rir_dir, g)
    ac = AcousticBank.from_rir_dir(g, rir_dir, goals, sounds, lengths, 4000, 800)
    ds = AudioNavDataset.from_split(
        os.path.join(out, "datasets", "audionav", "tiny", "train",
                     "train.json.gz")
    )
    assert len(ds.episodes) == 30
    bank = episodes_to_bank(
        ds.episodes, g, ac, {n: i for i, n in enumerate(names)}
    )
    fb = FrameBank.from_cache_pickle(
        os.path.join(out, "scene_observations", "tiny.pkl"), g.num_nodes
    )
    assets = SceneAssets(graph=g, acoustics=ac, frames=fb)
    env = AudioNavEnv(
        EnvConfig(sensors=("spectrogram", "oracle_action", "depth")),
        DeviceScene.from_assets(assets), bank, 4,
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    ag = OracleAgent()
    rng = jax.random.PRNGKey(1)
    spls = []
    for _ in range(60):
        rng, k = jax.random.split(rng)
        state, obs, r, d, info = env.step(
            state, jnp.asarray(ag(k, obs), jnp.int32)
        )
        spls += [float(info["spl"][i]) for i in range(4) if bool(d[i])]
    assert spls and min(spls) > 0.999


def test_episode_schema_matches_reference(world):
    """Raw episode dicts carry exactly the reference's field names."""
    import gzip
    import json

    out, _ = world
    with gzip.open(
        os.path.join(out, "datasets", "audionav", "tiny", "val", "content",
                     "tiny.json.gz"), "rt"
    ) as f:
        eps = json.loads(f.read())["episodes"]
    ep = eps[0]
    assert set(ep) == {
        "episode_id", "scene_id", "start_position", "start_rotation",
        "goals", "info",
    }
    assert set(ep["info"]) == {"geodesic_distance", "num_action", "sound"}
    assert ep["goals"][0]["radius"] == pytest.approx(1e-5)
    assert ep["scene_id"].endswith(".glb")


def test_unknown_episode_field_fails_loudly(tmp_path):
    import gzip
    import json

    from soundspaces_tpu.datasets import AudioNavDataset

    path = tmp_path / "bad.json.gz"
    with gzip.open(path, "wt") as f:
        f.write(json.dumps({"episodes": [{"episode_id": "0", "surprise": 1}]}))
    with pytest.raises(AssertionError, match="surprise"):
        AudioNavDataset.from_split(str(path))


def test_audionav_episodes_only_augmentation(world):
    """make_realistic --audionav-episodes: a hop-bounded episode dataset
    written against an ALREADY-built world (graph/RIRs/frames untouched)
    under its own datasets/<name>/ root, in the reference schema with the
    requested geodesic band (the round-5 short-horizon continuous
    datasets, configs/realistic_continuous_short.yaml)."""
    import gzip
    import json

    from soundspaces_tpu.scene import SceneGraph
    from soundspaces_tpu.tools.make_realistic import (
        augment_audionav_episodes,
    )

    out, _ = world
    summary = augment_audionav_episodes(
        out, scene="tiny", train_episodes=12, val_episodes=4,
        test_episodes=4, seed=3, min_hops=2, max_hops=5,
        dataset_name="audionav_short",
    )
    assert summary["hops"] == [2, 5]
    g = SceneGraph.from_metadata(os.path.join(out, "metadata", "tiny"))
    # reference layout: {split}.json.gz is the (possibly empty) container,
    # content/{scene}.json.gz holds the scene's episodes
    path = os.path.join(
        out, "datasets", "audionav_short", "tiny", "train", "content",
        "tiny.json.gz"
    )
    with gzip.open(path, "rt") as f:
        eps = json.load(f)["episodes"]
    assert len(eps) == 12
    for ep in eps:
        hops = ep["info"]["geodesic_distance"] / g.grid_size
        assert 2 <= round(hops) <= 5
    # the original full-range dataset is untouched
    assert os.path.exists(
        os.path.join(out, "datasets", "audionav", "tiny", "train",
                     "train.json.gz")
    )


def test_realistic44_world_in_tree_is_consistent():
    """The committed 44.1 kHz world (data/realistic44, the north-star
    bench's real-asset operating point — configs/realistic44_audiogoal.yaml,
    results/bench_realistic44_r4.jsonl) must stay loadable and internally
    consistent: config paths exist, the metadata graph matches world.json,
    episode datasets parse, and one RIR wav reads back at 44.1 kHz."""
    import gzip
    import json as _json

    root = os.path.join(os.path.dirname(__file__), "..", "data", "realistic44")
    if not os.path.isdir(root):
        pytest.skip("data/realistic44 not built")
    with open(os.path.join(root, "world.json")) as f:
        world = _json.load(f)
    assert world["sampling_rate"] == 44100 and world["rir_max_len"] == 44100

    from soundspaces_tpu.config import get_config
    from soundspaces_tpu.scene import SceneGraph

    cfg = get_config("configs/realistic44_audiogoal.yaml", [])
    for p in (cfg.data.metadata_dir, cfg.data.binaural_rir_dir,
              cfg.data.source_sound_dir, cfg.data.scene_observation_file,
              cfg.data.episode_split_path, cfg.data.eval_episode_split_path):
        assert os.path.exists(p), p

    g = SceneGraph.from_metadata(cfg.data.metadata_dir)
    assert g.num_nodes == world["num_nodes"]

    scene = world["scene"]
    with gzip.open(os.path.join(root, "datasets", "audionav", scene,
                                "train", "content", f"{scene}.json.gz"),
                   "rt") as f:
        eps = _json.load(f)["episodes"]
    assert len(eps) == world["episodes"]["train"]

    from scipy.io import wavfile

    ang = os.path.join(cfg.data.binaural_rir_dir, "0")
    wav = sorted(os.listdir(ang))[0]
    sr, data = wavfile.read(os.path.join(ang, wav))
    assert sr == 44100 and data.shape[1] == 2 and data.shape[0] > 0
