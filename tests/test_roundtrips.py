"""On-disk format round-trips: metadata, observation cache, episode
datasets written by our tools load back through the reference-format
loaders; the savi CLI path builds and trains."""

import json

import numpy as np
import pytest

import jax

from soundspaces_tpu.scene import SceneGraph, make_synthetic_assets
from soundspaces_tpu.scene.banks import FrameBank
from soundspaces_tpu.tools.cache_tools import (
    write_episode_dataset,
    write_metadata,
    write_observation_cache,
)


@pytest.fixture(scope="module")
def assets():
    return make_synthetic_assets(num_nodes_hint=24, sampling_rate=4000,
                                 rir_max_len=600, image_size=8, seed=101)


def test_metadata_roundtrip(assets, tmp_path):
    write_metadata(assets.graph, str(tmp_path))
    g2 = SceneGraph.from_metadata(str(tmp_path), assets.graph.grid_size)
    assert g2.num_nodes == assets.graph.num_nodes
    np.testing.assert_array_equal(g2.forward_neighbor,
                                  assets.graph.forward_neighbor)
    np.testing.assert_array_equal(g2.geodesic_hops, assets.graph.geodesic_hops)


def test_observation_cache_roundtrip(assets, tmp_path):
    path = write_observation_cache(assets.frames, str(tmp_path / "scene.pkl"))
    fb = FrameBank.from_cache_pickle(path, assets.graph.num_nodes)
    for name, arr in assets.frames.modalities.items():
        np.testing.assert_array_equal(fb.modalities[name], arr)


def test_episode_dataset_roundtrip(assets, tmp_path):
    from soundspaces_tpu.datasets import AudioNavDataset, episodes_to_bank

    path = write_episode_dataset(
        assets, str(tmp_path), "train", "apt0", 12, ["telephone", "siren"],
    )
    ds = AudioNavDataset.from_split(path)
    assert len(ds.episodes) == 12
    bank = episodes_to_bank(
        ds.episodes, assets.graph, assets.acoustics,
        {"telephone": 0, "siren": 1},
    )
    assert bank.num_episodes == 12
    assert (np.asarray(bank.geodesic) > 0).all()


def test_savi_cli_train_smoke(tmp_path):
    from soundspaces_tpu.run import main

    exp = tmp_path / "savi.yaml"
    exp.write_text(
        "trainer_name: savi\n"
        "trainer:\n  num_updates: 1\n  num_envs: 2\n  log_interval: 1\n"
        "ppo:\n  num_steps: 2\n  ppo_epoch: 1\n  num_mini_batch: 1\n"
        "smt:\n  memory_size: 6\n  hidden_size: 32\n  nhead: 4\n"
        "env:\n  sensors: [spectrogram, depth, pose, category, "
        "pointgoal_with_gps_compass]\n  max_episode_steps: 8\n"
        "data:\n  num_nodes_hint: 16\n  sampling_rate: 4000\n"
        "  rir_max_len: 500\n  image_size: 32\n  num_episodes: 16\n"
    )
    model_dir = tmp_path / "savirun"
    main([
        "--run-type", "train", "--exp-config", str(exp),
        "--model-dir", str(model_dir), "--force-cpu",
    ])
    lines = [json.loads(l) for l in (model_dir / "train.log").read_text().splitlines()]
    assert lines and np.isfinite(lines[-1]["action_loss"])
