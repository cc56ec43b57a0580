"""SemanticAudioNav on the realistic reference-format world: the semantic
augment writes per-category sounds, a .house annotation, semantic instance
frames and semantic episode datasets in the reference's layouts
(semantic_audionav_task.py:29-97, semantic_audionav_dataset.py:143-217,
mp3d_utils.py:86-192), and the whole stack ingests them exclusively through
the reference-format loaders (builder/config path)."""

import gzip
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from soundspaces_tpu.tools.make_realistic import (
        augment_semantic,
        build_world,
    )

    out = str(tmp_path_factory.mktemp("semworld"))
    build_world(
        out, scene="tiny", width=12, depth=12, num_goals=4,
        sampling_rate=4000, rir_max_len=800, num_rays=60,
        train_episodes=24, val_episodes=8, test_episodes=8,
        image_size=16, seed=0,
    )
    summary = augment_semantic(
        out, scene="tiny", categories=("chair", "table", "tv_monitor"),
        train_episodes=24, val_episodes=8, test_episodes=8,
        image_size=16, seed=0,
    )
    return out, summary


def _config(out: str):
    import dataclasses

    from soundspaces_tpu.config.experiment import ExperimentConfig

    cfg = ExperimentConfig()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data,
            synthetic=False,
            sampling_rate=4000,
            rir_max_len=800,
            image_size=16,
            metadata_dir=os.path.join(out, "metadata", "tiny"),
            binaural_rir_dir=os.path.join(out, "binaural_rirs", "tiny"),
            source_sound_dir=os.path.join(out, "sounds", "semantic"),
            scene_observation_file=os.path.join(
                out, "scene_observations", "tiny.pkl"
            ),
            house_file=os.path.join(out, "metadata", "tiny", "tiny.house"),
            episode_split_path=os.path.join(
                out, "datasets", "semantic_audionav", "tiny", "train",
                "train.json.gz",
            ),
        ),
        env=dataclasses.replace(
            cfg.env,
            sensors=(
                "spectrogram", "depth", "semantic_object", "pose",
                "category", "oracle_action",
            ),
            has_distractor_sound=True,
            everlasting=False,
        ),
    )
    return cfg


def test_semantic_layout_on_disk(world):
    out, summary = world
    assert os.path.exists(
        os.path.join(out, "metadata", "tiny", "tiny.house")
    )
    assert os.path.exists(
        os.path.join(out, "sounds", "semantic", "chair_0.wav")
    )
    assert os.path.exists(
        os.path.join(out, "datasets", "semantic_audionav", "tiny", "train",
                     "content", "tiny.json.gz")
    )
    assert set(summary["categories"]) == {"chair", "table", "tv_monitor"}
    # every category appears among the goal objects
    assert set(summary["goal_categories"]) == {"chair", "table", "tv_monitor"}


def test_semantic_episode_schema_matches_reference(world):
    """Field names match SemanticAudioGoalNavEpisode/SemanticAudioGoal
    (semantic_audionav_task.py:29-97); view_points are bare agent-state
    positions (the on-disk form __deserialize_goal wraps,
    semantic_audionav_dataset.py:146-150)."""
    out, _ = world
    with gzip.open(
        os.path.join(out, "datasets", "semantic_audionav", "tiny", "val",
                     "content", "tiny.json.gz"), "rt"
    ) as f:
        eps = json.loads(f.read())["episodes"]
    base = {
        "episode_id", "scene_id", "start_position", "start_rotation",
        "object_category", "sound_id", "offset", "duration", "goals", "info",
    }
    with_distractor = base | {"distractor_sound_id",
                              "distractor_position_index"}
    seen_distractor = False
    for ep in eps:
        assert set(ep) in (base, with_distractor)
        seen_distractor |= "distractor_sound_id" in ep
        g = ep["goals"][0]
        assert set(g) == {
            "position", "radius", "object_id", "object_category",
            "view_points",
        }
        assert g["object_category"] == ep["object_category"]
        # sound voices the goal category but is not identical per category
        assert ep["sound_id"].rsplit("_", 1)[0] == ep["object_category"]
        for vp in g["view_points"]:
            assert isinstance(vp, list) and len(vp) == 3
    assert seen_distractor


def test_house_round_trip(world):
    from soundspaces_tpu.scene.mp3d import (
        CATEGORY_TO_MPCAT40,
        HouseReader,
    )

    out, summary = world
    r = HouseReader(os.path.join(out, "metadata", "tiny", "tiny.house"))
    assert len(r.objects) == 4
    names = [r.categories[o.category] for o in r.objects]
    assert names == summary["goal_categories"]
    table = r.instance_to_mpcat40_table()
    assert table[0] == 0
    for i, name in enumerate(names):
        assert table[i + 1] == CATEGORY_TO_MPCAT40[name]


def test_builder_ingestion_and_semantics(world):
    """Full config-path ingestion: assets (house -> instance table), semantic
    episode bank (categories/durations/offsets/distractors/view points), and
    env stepping with category + semantic_object sensors."""
    from soundspaces_tpu.builder import build_assets, load_episode_bank
    from soundspaces_tpu.env import AudioNavEnv, DeviceScene
    from soundspaces_tpu.scene.mp3d import CATEGORY_INDEX_MAPPING

    out, summary = world
    cfg = _config(out)
    assets = build_assets(cfg)
    assert assets.instance_to_mpcat is not None
    assert assets.instance_to_mpcat.shape[0] == 4 + 1  # instances 0..4
    bank = load_episode_bank(cfg, assets, cfg.data.episode_split_path)
    n = int(bank.start_node.shape[0])
    assert n == 24
    cats = np.asarray(bank.category)
    wanted = {CATEGORY_INDEX_MAPPING[c] for c in summary["categories"]}
    assert set(cats.tolist()) <= wanted
    assert len(set(cats.tolist())) > 1
    # durations vary, offsets within the 2 s clips, some distractors wired
    assert len(set(np.asarray(bank.duration_sec).tolist())) > 1
    assert np.asarray(bank.offset_sec).max() <= 2
    d_sound = np.asarray(bank.distractor_sound_id)
    assert (d_sound >= 0).any()
    d_slot = np.asarray(bank.distractor_slot)
    assert (d_slot[d_sound >= 0] >= 0).all()
    # view points include the goal plus its graph neighbors
    vps = np.asarray(bank.viewpoint_nodes)
    assert vps.shape[1] >= 2
    assert (np.sort(vps, 1)[:, -1] == np.asarray(bank.goal_node)).any() or (
        (vps >= 0).sum(1) >= 2
    ).all()

    env = AudioNavEnv(
        cfg.env, DeviceScene.from_assets(assets), bank, 4
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    # category one-hot matches the episode's object category
    onehot = np.asarray(obs["category"])
    assert onehot.shape == (4, cfg.env.num_categories)
    for i in range(4):
        assert onehot[i].argmax() == int(state.category[i])
        assert int(state.category[i]) in wanted
    # semantic_object frames carry task-category ids (not raw instances)
    sem = np.asarray(obs["semantic_object"])
    valid = set(range(len(CATEGORY_INDEX_MAPPING) + 1))
    assert set(np.unique(sem).tolist()) <= valid
    # stepping works with distractor mixing + duration silencing
    for _ in range(3):
        state, obs, rew, done, info = env.step(
            state, jnp.array([1, 2, 3, 1])
        )
    assert np.isfinite(np.asarray(obs["spectrogram"])).all()


def test_goal_instance_visible_near_goal(world):
    """The semantic raster must show the goal object's instance id from at
    least one view at nodes adjacent to the goal (the property SAVi's
    semantic-vision pathway needs to associate category with location)."""
    from soundspaces_tpu.builder import build_assets
    from soundspaces_tpu.scene.mp3d import HouseReader

    out, _ = world
    cfg = _config(out)
    assets = build_assets(cfg)
    sem = assets.frames.modalities["semantic"]  # [N, 4, H, W, 1]
    house = HouseReader(cfg.data.house_file)
    hits = 0
    for oi, obj in enumerate(house.objects):
        d = np.linalg.norm(assets.graph.points - obj.position[None], axis=1)
        node = int(np.argmin(d))
        nbrs = [node] + [
            int(b) for b in assets.graph.forward_neighbor[node] if int(b) >= 0
        ]
        if any((sem[nb] == oi + 1).any() for nb in nbrs):
            hits += 1
    assert hits == len(house.objects)
