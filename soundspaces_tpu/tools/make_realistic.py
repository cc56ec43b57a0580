"""Build a realistic Replica/MP3D-class benchmark world on disk, in the
reference's exact dataset layouts.

Produces, under --out (default data/realistic):

    metadata/{scene}/points.txt, graph.pkl        (utils.py:15-39)
    binaural_rirs/{scene}/{angle}/{r}_{s}.wav     (simulator.py:614-618)
    sounds/1s_all/*.wav                           (simulator.py:595-600)
    datasets/audionav/{scene}/{split}/{split}.json.gz
        + content/{scene}.json.gz                 (audionav_dataset.py:28-165)
    scene_observations/{scene}.pkl                (cache_observations.py)

The scene is a 1000+-node multi-room floorplan (scene/floorplan.py); RIRs
are rendered by the native C++ geometric-acoustics tracer
(csrc/rir_tracer.cpp) — the in-tree equivalent of the RLRAudioPropagation
engine that rendered the reference's banks; source sounds include the
reference checkout's own res/singing.wav (resampled), exercising real
multi-second audio. Everything downstream (training, eval, bench) ingests
these files exclusively through the reference-format loaders.

Usage: python -m soundspaces_tpu.tools.make_realistic --out data/realistic
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

REFERENCE_SINGING = "/root/reference/res/singing.wav"


def synth_telephone(sampling_rate: int, secs: float = 2.0) -> np.ndarray:
    """Dual-tone ring burst pattern (the reference's canonical telephone
    source sound, res not shipped — synthesized at matching structure)."""
    t = np.arange(int(secs * sampling_rate)) / sampling_rate
    ring = np.sin(2 * np.pi * 440 * t) + np.sin(2 * np.pi * 480 * t)
    gate = (np.mod(t, 1.0) < 0.7).astype(np.float32)
    return (0.45 * ring * gate).astype(np.float32)


def synth_fan(sampling_rate: int, secs: float = 3.0, seed: int = 7) -> np.ndarray:
    """Broadband machinery-like noise with a low-frequency hum."""
    rng = np.random.default_rng(seed)
    n = int(secs * sampling_rate)
    noise = rng.standard_normal(n).astype(np.float32)
    # one-pole lowpass for a fan-like spectrum
    out = np.empty_like(noise)
    acc = 0.0
    for i in range(n):  # small n; clarity over speed
        acc = 0.92 * acc + 0.08 * noise[i]
        out[i] = acc
    t = np.arange(n) / sampling_rate
    hum = 0.2 * np.sin(2 * np.pi * 120 * t)
    sig = 4.0 * out + hum
    return (0.5 * sig / np.abs(sig).max()).astype(np.float32)


def build_sounds(sampling_rate: int) -> dict[str, np.ndarray]:
    from soundspaces_tpu.tools.reference_format import load_wav_mono

    sounds = {
        "telephone": synth_telephone(sampling_rate),
        "fan": synth_fan(sampling_rate),
    }
    if os.path.exists(REFERENCE_SINGING):
        # the reference's own source recording (4.9 s @48 kHz) — real
        # multi-second audio through the real ingestion path
        sounds["singing"] = load_wav_mono(REFERENCE_SINGING, sampling_rate)
    return sounds


def build_world(
    out: str,
    scene: str = "apartment_1k",
    width: int = 40,
    depth: int = 40,
    num_goals: int = 12,
    sampling_rate: int = 16000,
    rir_max_len: int = 8000,
    num_rays: int = 500,
    train_episodes: int = 4000,
    val_episodes: int = 200,
    test_episodes: int = 500,
    image_size: int = 128,
    seed: int = 0,
    write_frames: bool = True,
    three_d: bool = False,
) -> dict:
    from soundspaces_tpu.scene.floorplan import floorplan_graph, spread_goal_nodes
    from soundspaces_tpu.scene.synthetic import synth_frames
    from soundspaces_tpu.tools import reference_format as rf
    from soundspaces_tpu.tools.rir_synth import (
        synth_rir_bank_native,
        synth_rir_bank_native_3d,
    )

    t0 = time.time()
    graph = floorplan_graph(width, depth, seed=seed)
    goal_nodes = spread_goal_nodes(graph, num_goals, seed=seed + 1)
    summary = {
        "scene": scene,
        "num_nodes": graph.num_nodes,
        "num_goals": len(goal_nodes),
        "sampling_rate": sampling_rate,
        "rir_max_len": rir_max_len,
    }
    print(f"[graph] {graph.num_nodes} nodes ({time.time()-t0:.1f}s)", flush=True)

    rf.write_metadata(graph, os.path.join(out, "metadata", scene))

    sounds = build_sounds(sampling_rate)
    rf.write_sound_dir(
        sounds, os.path.join(out, "sounds", "1s_all"), sampling_rate
    )
    summary["sounds"] = sorted(sounds)
    summary["sound_secs"] = {
        k: round(v.shape[0] / sampling_rate, 2) for k, v in sounds.items()
    }

    t1 = time.time()
    if three_d:
        # full 3-D engine: floor/ceiling reflections, the reference's
        # +1.5 m ear/source heights (simulator.py:390), elevation cues
        rirs = synth_rir_bank_native_3d(
            graph, goal_nodes, sampling_rate, rir_max_len,
            num_rays=num_rays, seed=seed,
        )
    else:
        rirs = synth_rir_bank_native(
            graph, goal_nodes, sampling_rate, rir_max_len,
            num_rays=num_rays, seed=seed,
        )
    print(f"[tracer] {4*graph.num_nodes*len(goal_nodes)} RIRs "
          f"({time.time()-t1:.1f}s)", flush=True)
    t1 = time.time()
    n_files = rf.write_binaural_rirs(
        rirs, goal_nodes,
        os.path.join(out, "binaural_rirs", scene), sampling_rate,
    )
    summary["rir_files"] = n_files
    print(f"[rirs] {n_files} wavs ({time.time()-t1:.1f}s)", flush=True)

    sound_names = sorted(sounds)
    ep_dir = os.path.join(out, "datasets", "audionav", scene)
    for split, count, s_off in (
        ("train", train_episodes, 10),
        ("val", val_episodes, 11),
        ("test", test_episodes, 12),
    ):
        eps = rf.make_episode_records(
            graph, goal_nodes, sound_names, count, scene, seed=seed + s_off
        )
        rf.write_episode_dataset(
            {scene: eps}, os.path.join(ep_dir, split), split
        )
    summary["episodes"] = {
        "train": train_episodes, "val": val_episodes, "test": test_episodes
    }

    if write_frames:
        t1 = time.time()
        frames = synth_frames(graph, image_size, image_size, ("depth",), seed)
        rf.write_frame_cache(
            frames.modalities,
            os.path.join(out, "scene_observations", f"{scene}.pkl"),
        )
        print(f"[frames] ({time.time()-t1:.1f}s)", flush=True)

    summary["build_secs"] = round(time.time() - t0, 1)
    with open(os.path.join(out, "world.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def build_semantic_sounds(
    categories: list[str], sampling_rate: int, clips_per: int = 2,
    secs: float = 2.0,
) -> dict[str, np.ndarray]:
    """Distinct multi-clip voices per object category: each clip is a tonal
    burst pattern whose f0/modulation are keyed on the category (shared
    timbre family) and the clip index (variation), so sound -> category is
    many-to-one and inferable but not an alias (the role of the reference's
    per-category semantic sound set, semantic_audionav_task.py:28-46)."""
    out: dict[str, np.ndarray] = {}
    t = np.arange(int(secs * sampling_rate)) / sampling_rate
    for ci, cat in enumerate(categories):
        f_base = 260.0 * (2.0 ** (ci % 8 / 4.0))  # category timbre
        for k in range(clips_per):
            rng = np.random.default_rng(hash((cat, k)) % (1 << 31))
            f0 = f_base * (1.0 + 0.06 * k)
            mod = 2.5 + 2.0 * k + (ci % 3)
            wave = np.sin(2 * np.pi * f0 * t) + 0.5 * np.sin(
                2 * np.pi * 2.01 * f0 * t
            )
            gate = 0.55 + 0.45 * np.sign(np.sin(2 * np.pi * mod * t))
            wave = wave * gate + 0.05 * rng.standard_normal(t.shape)
            out[f"{cat}_{k}"] = (
                0.4 * wave / np.abs(wave).max()
            ).astype(np.float32)
    return out


def augment_audionav_episodes(
    out: str,
    scene: str = "apartment_1k",
    train_episodes: int = 4000,
    val_episodes: int = 500,
    test_episodes: int = 1000,
    seed: int = 0,
    min_hops: int = 4,
    max_hops: int = 60,
    dataset_name: str = "audionav",
) -> dict:
    """Write an additional hop-bounded AudioNav episode dataset against an
    ALREADY-BUILT world (graph / RIR bank / frames untouched — episode
    datasets are independent of the acoustics, audionav_dataset.py:28-165).
    Lets a short-horizon variant (e.g. 4-16 hops = 2-8 m) coexist with the
    full-range default under datasets/<dataset_name>/."""
    from soundspaces_tpu.builder import discover_goal_nodes
    from soundspaces_tpu.scene.graph import SceneGraph
    from soundspaces_tpu.tools import reference_format as rf

    t0 = time.time()
    graph = SceneGraph.from_metadata(os.path.join(out, "metadata", scene))
    goal_nodes = discover_goal_nodes(
        os.path.join(out, "binaural_rirs", scene), graph
    )
    sound_dir = os.path.join(out, "sounds", "1s_all")
    sound_names = sorted(
        os.path.splitext(f)[0]
        for f in os.listdir(sound_dir) if f.endswith(".wav")
    )
    ep_dir = os.path.join(out, "datasets", dataset_name, scene)
    for split, count, s_off in (
        ("train", train_episodes, 10),
        ("val", val_episodes, 11),
        ("test", test_episodes, 12),
    ):
        eps = rf.make_episode_records(
            graph, goal_nodes, sound_names, count, scene,
            seed=seed + s_off, min_hops=min_hops, max_hops=max_hops,
        )
        rf.write_episode_dataset(
            {scene: eps}, os.path.join(ep_dir, split), split
        )
    return {
        "dataset_name": dataset_name,
        "hops": [min_hops, max_hops],
        "episodes": {
            "train": train_episodes, "val": val_episodes,
            "test": test_episodes,
        },
        "build_secs": round(time.time() - t0, 1),
    }


def augment_semantic(
    out: str,
    scene: str = "apartment_1k",
    categories: tuple[str, ...] = (
        "tv_monitor", "sink", "cabinet", "table", "chair", "sofa",
    ),
    train_episodes: int = 4000,
    val_episodes: int = 200,
    test_episodes: int = 500,
    image_size: int = 128,
    seed: int = 0,
    min_hops: int = 4,
    max_hops: int = 60,
    dataset_name: str = "semantic_audionav",
) -> dict:
    """Add SemanticAudioNav assets on top of an existing realistic world,
    reusing its traced RIR bank (RIRs depend only on geometry, not on the
    source sound): per-category sound clips, a .house object annotation,
    semantic instance frames merged into the scene_observations cache, and
    semantic episode datasets — all in the reference's layouts."""
    import pickle

    from soundspaces_tpu.builder import discover_goal_nodes
    from soundspaces_tpu.scene.graph import SceneGraph
    from soundspaces_tpu.scene.synthetic import raster_object_frames
    from soundspaces_tpu.tools import reference_format as rf

    t0 = time.time()
    meta_dir = os.path.join(out, "metadata", scene)
    graph = SceneGraph.from_metadata(meta_dir)
    rir_dir = os.path.join(out, "binaural_rirs", scene)
    goal_nodes = discover_goal_nodes(rir_dir, graph)
    with open(os.path.join(out, "world.json")) as f:
        world = json.load(f)
    sampling_rate = world["sampling_rate"]

    # each goal node hosts a sounding object of one category
    rng = np.random.default_rng(seed + 5)
    goal_categories = [
        categories[int(rng.integers(0, len(categories)))]
        if i >= len(categories) else categories[i]  # every category appears
        for i in range(len(goal_nodes))
    ]

    sounds = build_semantic_sounds(list(categories), sampling_rate)
    rf.write_sound_dir(
        sounds, os.path.join(out, "sounds", "semantic"), sampling_rate
    )
    sound_secs = {
        k: max(int(round(v.shape[0] / sampling_rate)), 1)
        for k, v in sounds.items()
    }
    sounds_by_category = {
        c: sorted(k for k in sounds if k.rsplit("_", 1)[0] == c)
        for c in categories
    }

    house_path = os.path.join(meta_dir, f"{scene}.house")
    obj_pos = graph.points[np.asarray(goal_nodes)]
    rf.write_house_file(house_path, obj_pos, goal_categories)

    # semantic instance rasters merged into the existing frame cache
    sem = raster_object_frames(
        graph, obj_pos, np.asarray(goal_nodes), image_size, image_size
    )
    cache_path = os.path.join(out, "scene_observations", f"{scene}.pkl")
    with open(cache_path, "rb") as f:
        cache = pickle.load(f)
    for (node, angle), obs in cache.items():
        obs["semantic"] = sem[node, (angle // 90) % 4]
    with open(cache_path, "wb") as f:
        pickle.dump(cache, f)

    ep_dir = os.path.join(out, "datasets", dataset_name, scene)
    for split, count, s_off in (
        ("train", train_episodes, 20),
        ("val", val_episodes, 21),
        ("test", test_episodes, 22),
    ):
        eps = rf.make_semantic_episode_records(
            graph, goal_nodes, goal_categories, sounds_by_category,
            sound_secs, count, scene, seed=seed + s_off,
            min_hops=min_hops, max_hops=max_hops,
        )
        rf.write_episode_dataset(
            {scene: eps}, os.path.join(ep_dir, split), split
        )

    world["semantic"] = {
        "categories": list(categories),
        "goal_categories": goal_categories,
        "sounds": sorted(sounds),
        "house_file": house_path,
        "episodes": {
            "train": train_episodes, "val": val_episodes,
            "test": test_episodes,
        },
        "build_secs": round(time.time() - t0, 1),
    }
    with open(os.path.join(out, "world.json"), "w") as f:
        json.dump(world, f, indent=1)
    return world["semantic"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/realistic")
    ap.add_argument("--scene", default="apartment_1k")
    ap.add_argument("--width", type=int, default=40)
    ap.add_argument("--depth", type=int, default=40)
    ap.add_argument("--num-goals", type=int, default=12)
    ap.add_argument("--sampling-rate", type=int, default=16000)
    ap.add_argument("--rir-max-len", type=int, default=8000)
    ap.add_argument("--num-rays", type=int, default=500)
    ap.add_argument("--train-episodes", type=int, default=4000)
    # reference eval protocol sizes (savi/config/default.py:283-290):
    # val -> 500 episodes, test -> 1000
    ap.add_argument("--val-episodes", type=int, default=500)
    ap.add_argument("--test-episodes", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--three-d", action="store_true",
        help="trace the bank with the 3-D engine (floor/ceiling "
        "reflections, source heights, elevation cues)")
    ap.add_argument(
        "--semantic", action="store_true",
        help="augment an already-built world with SemanticAudioNav assets "
        "(per-category sounds, .house annotation, semantic frames, "
        "semantic episode datasets) — reuses the traced RIR bank",
    )
    ap.add_argument(
        "--semantic-hops", type=int, nargs=2, default=(4, 60),
        metavar=("MIN", "MAX"),
        help="geodesic hop bounds for semantic episode sampling; e.g. "
        "'4 16' (2-8 m at 0.5 m spacing) matches the Replica scene scale "
        "where the reference demonstrates SAVi single-node training",
    )
    ap.add_argument(
        "--semantic-dataset-name", default="semantic_audionav",
        help="datasets/<name>/ output subdir — lets hop-bounded episode "
        "variants coexist with the full-range default",
    )
    ap.add_argument(
        "--audionav-episodes", action="store_true",
        help="episodes-only mode: write an additional hop-bounded AudioNav "
        "episode dataset against an already-built world (reuses graph/RIRs/"
        "frames); combine with --audionav-hops/--audionav-dataset-name",
    )
    ap.add_argument(
        "--audionav-hops", type=int, nargs=2, default=(4, 60),
        metavar=("MIN", "MAX"),
        help="geodesic hop bounds for --audionav-episodes; '4 16' is the "
        "2-8 m short-horizon band used by the SAVi realistic runs",
    )
    ap.add_argument("--audionav-dataset-name", default="audionav")
    args = ap.parse_args()
    if args.audionav_episodes:
        summary = augment_audionav_episodes(
            args.out, scene=args.scene, train_episodes=args.train_episodes,
            val_episodes=args.val_episodes, test_episodes=args.test_episodes,
            seed=args.seed, min_hops=args.audionav_hops[0],
            max_hops=args.audionav_hops[1],
            dataset_name=args.audionav_dataset_name,
        )
        print(json.dumps(summary))
        return
    if args.semantic:
        summary = augment_semantic(
            args.out, scene=args.scene, train_episodes=args.train_episodes,
            val_episodes=args.val_episodes, test_episodes=args.test_episodes,
            seed=args.seed,
            min_hops=args.semantic_hops[0], max_hops=args.semantic_hops[1],
            dataset_name=args.semantic_dataset_name,
        )
        print(json.dumps(summary))
        return
    summary = build_world(
        args.out, scene=args.scene, width=args.width, depth=args.depth,
        num_goals=args.num_goals, sampling_rate=args.sampling_rate,
        rir_max_len=args.rir_max_len, num_rays=args.num_rays,
        train_episodes=args.train_episodes, val_episodes=args.val_episodes,
        test_episodes=args.test_episodes, seed=args.seed,
        three_d=args.three_d,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
