"""Config -> assets/env/trainer wiring (the construct_envs + trainer-registry
role of ss_baselines/common/env_utils.py:25-136 and run.py:24-101)."""

from __future__ import annotations

import os

import numpy as np

from soundspaces_tpu.config import ExperimentConfig
from soundspaces_tpu.env import AudioNavEnv, DeviceScene, make_episode_bank
from soundspaces_tpu.env.structs import EpisodeBank
from soundspaces_tpu.scene import SceneGraph, make_synthetic_assets
from soundspaces_tpu.scene.banks import AcousticBank, FrameBank, SceneAssets
from soundspaces_tpu.utils import registry


def build_assets(cfg: ExperimentConfig) -> SceneAssets:
    d = cfg.data
    if d.synthetic:
        return make_synthetic_assets(
            num_nodes_hint=d.num_nodes_hint,
            num_goals=d.num_goals,
            num_sounds=d.num_sounds,
            sampling_rate=d.sampling_rate,
            rir_max_len=d.rir_max_len,
            max_secs=d.max_secs,
            image_size=d.image_size,
            modalities=tuple(d.modalities),
            seed=d.seed,
        )
    graph = SceneGraph.from_metadata(d.metadata_dir, d.grid_size)
    sounds, names, lengths = load_source_sounds(
        d.source_sound_dir, d.sampling_rate
    )
    goal_nodes = discover_goal_nodes(d.binaural_rir_dir, graph)
    acoustics = AcousticBank.from_rir_dir(
        graph, d.binaural_rir_dir, goal_nodes, sounds, lengths,
        d.sampling_rate, d.rir_max_len,
    )
    frames = (
        FrameBank.from_cache_pickle(d.scene_observation_file, graph.num_nodes)
        if d.scene_observation_file
        else FrameBank({})
    )
    instance_to_mpcat = None
    node_category = None
    if d.house_file:
        from soundspaces_tpu.scene.mp3d import HouseReader, CATEGORY_INDEX_MAPPING

        house = HouseReader(d.house_file)
        instance_to_mpcat = house.instance_to_mpcat40_table()
        # per-node sounding-object category (synthetic-path parity): the
        # category of the object AT the node, for nodes hosting one
        node_category = np.zeros(graph.num_nodes, np.int32)
        for obj in house.objects:
            d2 = np.linalg.norm(graph.points - obj.position[None], axis=1)
            name = house.categories.get(obj.category, "")
            node_category[int(np.argmin(d2))] = CATEGORY_INDEX_MAPPING.get(
                name, 0
            )
    return SceneAssets(
        graph=graph, acoustics=acoustics, frames=frames,
        instance_to_mpcat=instance_to_mpcat, node_category=node_category,
    )


def discover_scenes(cfg: ExperimentConfig) -> list[str]:
    """Scene set for a reference-layout data root: the explicit
    `data.scenes` list, else the scenes whose `content/{scene}.json.gz`
    files sit next to the episode split — the reference derives its scene
    set from the dataset the same way before round-robining it across
    workers (env_utils.py:36-44, audionav_dataset.py:60-76)."""
    if cfg.data.scenes:
        return list(cfg.data.scenes)
    content_dir = os.path.join(
        os.path.dirname(cfg.data.episode_split_path), "content"
    )
    assert os.path.isdir(content_dir), (
        f"data.scene_root set but no data.scenes and no content dir at "
        f"{content_dir} to discover them from"
    )
    return sorted(
        f[: -len(".json.gz")]
        for f in os.listdir(content_dir)
        if f.endswith(".json.gz")
    )


def light_scene_assets(cfg: ExperimentConfig, scene: str):
    """Graph + goal-slot table only — enough to resolve an episode dataset
    against a scene whose banks are ALREADY device-resident. Skips
    re-reading the scene's entire RIR wav tree (GBs at realistic scale)."""
    from types import SimpleNamespace

    root = cfg.data.scene_root
    graph = SceneGraph.from_metadata(
        os.path.join(root, "metadata", scene), cfg.data.grid_size
    )
    goals = discover_goal_nodes(
        os.path.join(root, "binaural_rirs", scene), graph
    )
    slot = np.full(graph.num_nodes, -1, np.int32)
    slot[goals] = np.arange(len(goals), dtype=np.int32)
    return SimpleNamespace(
        graph=graph, acoustics=SimpleNamespace(goal_slot_of_node=slot)
    )


def build_scene_assets(cfg: ExperimentConfig, scene: str) -> SceneAssets:
    """One scene's assets out of a reference-layout data root
    ({root}/metadata/{scene}, {root}/binaural_rirs/{scene},
    {root}/scene_observations/{scene}.pkl, optional
    {root}/metadata/{scene}/{scene}.house)."""
    import dataclasses

    root = cfg.data.scene_root
    house = os.path.join(root, "metadata", scene, f"{scene}.house")
    d = dataclasses.replace(
        cfg.data,
        synthetic=False,
        metadata_dir=os.path.join(root, "metadata", scene),
        binaural_rir_dir=os.path.join(root, "binaural_rirs", scene),
        scene_observation_file=os.path.join(
            root, "scene_observations", f"{scene}.pkl"
        ),
        house_file=house if os.path.exists(house) else "",
    )
    return build_assets(dataclasses.replace(cfg, data=d))


def load_source_sounds(sound_dir: str, sampling_rate: int):
    """Load mono source wavs (the reference uses librosa.load with
    resampling, simulator.py:579-600; mismatched rates are resampled via
    tools.reference_format.resample). Returns (waves [S, max_samples]
    zero-padded to whole seconds, names, lengths_sec [S] true per-sound
    durations in whole seconds)."""
    from soundspaces_tpu.tools.reference_format import load_wav_mono

    names, waves = [], []
    for fname in sorted(os.listdir(sound_dir)):
        if not fname.endswith(".wav"):
            continue
        names.append(fname[: -len(".wav")])
        waves.append(load_wav_mono(os.path.join(sound_dir, fname),
                                   sampling_rate))
    lengths = np.array(
        [max(-(-w.shape[0] // sampling_rate), 1) for w in waves], np.int32
    )
    max_len = int(lengths.max()) * sampling_rate
    out = np.zeros((len(waves), max_len), np.float32)
    for i, w in enumerate(waves):
        out[i, : w.shape[0]] = w
    return out, names, lengths


def discover_goal_nodes(binaural_rir_dir: str, graph: SceneGraph) -> np.ndarray:
    """Goal (source) node set = distinct source indices present in the RIR
    directory's {receiver}_{source}.wav names. Filenames carry ORIGINAL
    graph.pkl node ids (non-contiguous on real reference metadata,
    simulator.py:614-616) — returned as dense row indices via
    graph.node_ids."""
    sources = set()
    angle_dir = os.path.join(binaural_rir_dir, "0")
    for fname in os.listdir(angle_dir):
        if fname.endswith(".wav"):
            sources.add(int(fname[:-4].split("_")[1]))
    ids = np.asarray(graph.node_ids, np.int64)
    orig = np.array(sorted(sources), np.int64)
    rows = np.searchsorted(ids, orig)
    valid = (rows < len(ids)) & (ids[np.minimum(rows, len(ids) - 1)] == orig)
    assert valid.all(), (
        f"RIR sources {orig[~valid][:5].tolist()} missing from graph.pkl "
        "node ids (trimmed nodes?) — cannot resolve goal slots"
    )
    return rows.astype(np.int32)


def load_episode_bank(
    cfg: ExperimentConfig,
    assets: SceneAssets,
    split_path: str,
    content_scenes: tuple[str, ...] = ("*",),
) -> EpisodeBank:
    """Episode bank from a reference-format {split}.json.gz dataset."""
    from soundspaces_tpu.datasets import AudioNavDataset, episodes_to_bank

    from soundspaces_tpu.scene.mp3d import CATEGORY_INDEX_MAPPING

    ds = AudioNavDataset.from_split(split_path, content_scenes=content_scenes)
    # only the name->id mapping is needed here — don't decode/resample every
    # source wav a second time just to learn the directory listing
    names = [
        f[: -len(".wav")]
        for f in sorted(os.listdir(cfg.data.source_sound_dir))
        if f.endswith(".wav")
    ]
    return episodes_to_bank(
        ds.episodes, assets.graph, assets.acoustics,
        {n: i for i, n in enumerate(names)},
        category_to_id=CATEGORY_INDEX_MAPPING,
    )


def build_env(
    cfg: ExperimentConfig,
    assets: SceneAssets | None = None,
    episodes: EpisodeBank | None = None,
    num_envs: int | None = None,
    sequential: bool = False,
    scene: DeviceScene | None = None,
) -> AudioNavEnv:
    multi_real = bool(
        assets is None and not cfg.data.synthetic and cfg.data.scene_root
    )
    if assets is None and (cfg.data.num_scenes > 1 or multi_real):
        assert episodes is None, (
            "an explicit episode bank cannot be combined with the "
            "multi-scene branch (it would be silently ignored)"
        )
        import dataclasses

        from soundspaces_tpu.train.multiscene import (
            MultiSceneEnv,
            stack_episode_banks,
            stack_scenes,
        )

        if multi_real:
            # reference-layout data root: one scene set shared by banks and
            # episodes, episodes drawn from each scene's content file —
            # the reference's scene round-robin over real datasets
            # (env_utils.py:36-69)
            scene_names = discover_scenes(cfg)
            # with a stacked DeviceScene passed in, the banks are already on
            # device: resolve episodes with graph-only assets instead of
            # re-reading every scene's RIR wavs
            make_assets = (
                build_scene_assets if scene is None else light_scene_assets
            )
            assets_list = [make_assets(cfg, s) for s in scene_names]
            split_path = cfg.data.episode_split_path
            if sequential and cfg.data.eval_episode_split_path:
                split_path = cfg.data.eval_episode_split_path
            banks = [
                load_episode_bank(cfg, a, split_path, content_scenes=(s,))
                for s, a in zip(scene_names, assets_list)
            ]
        else:
            assets_list = [
                build_assets(
                    dataclasses.replace(
                        cfg,
                        data=dataclasses.replace(
                            cfg.data, seed=cfg.data.seed + i
                        ),
                    )
                )
                for i in range(cfg.data.num_scenes)
            ]
            banks = [
                make_episode_bank(
                    a, cfg.data.num_episodes, seed=cfg.data.seed + 1 + i,
                    min_geodesic_hops=1,
                )
                for i, a in enumerate(assets_list)
            ]
        env_cfg = cfg.env
        if sequential:
            env_cfg = dataclasses.replace(env_cfg, episode_sampling="sequential")
        base_cls = None
        if getattr(cfg, "continuous", None) and cfg.continuous.enabled:
            from soundspaces_tpu.env.continuous import (
                ContinuousAudioNavEnv,
                ContinuousConfig,
            )

            c = cfg.continuous
            assert c.rir_source in ("bank", "parametric"), (
                "multi-scene continuous supports bank/parametric RIR "
                "sources (host tracers and per-scene neural fields don't "
                "group-dispatch; the reference likewise drops scenes for "
                "continuous rendering, env_utils.py:46-48)"
            )
            base_cls = ContinuousAudioNavEnv
            env_cfg = ContinuousConfig(
                step_size=c.step_size,
                turn_angle_deg=c.turn_angle_deg,
                step_time=c.step_time,
                use_crossfade=c.use_crossfade,
                success_distance=c.success_distance,
                max_episode_steps=cfg.env.max_episode_steps,
                slack_reward=cfg.env.slack_reward,
                success_reward=cfg.env.success_reward,
                distance_reward_scale=cfg.env.distance_reward_scale,
                sensors=tuple(cfg.env.sensors),
                rir_source=c.rir_source,
                live_depth=c.live_depth,
                depth_size=cfg.data.image_size,
                step_chunks=c.step_chunks,
                episode_sampling=env_cfg.episode_sampling,
                everlasting=cfg.env.everlasting,
                has_distractor_sound=cfg.env.has_distractor_sound,
                num_categories=cfg.env.num_categories,
            )
        return MultiSceneEnv(
            env_cfg,
            # a stacked DeviceScene passed in (e.g. the train env's) skips a
            # second host->device upload of every scene's banks
            scene if scene is not None else stack_scenes(assets_list),
            stack_episode_banks(banks),
            num_envs or cfg.trainer.num_envs,
            base_cls=base_cls,
        )
    assets = assets or build_assets(cfg)
    if scene is None:
        # sharing an existing env's DeviceScene skips a second host->device
        # bank upload (~GBs over the tunnel at realistic scale)
        scene = DeviceScene.from_assets(assets)
    if episodes is None:
        split_path = cfg.data.episode_split_path
        if sequential and cfg.data.eval_episode_split_path:
            # the reference swaps the dataset split for eval
            # (EVAL.SPLIT, base_trainer.py:124-157)
            split_path = cfg.data.eval_episode_split_path
        if split_path:
            episodes = load_episode_bank(cfg, assets, split_path)
        else:
            episodes = make_episode_bank(
                assets, cfg.data.num_episodes, seed=cfg.data.seed + 1,
                min_geodesic_hops=1,
            )
    env_cfg = cfg.env
    if sequential:
        import dataclasses

        env_cfg = dataclasses.replace(env_cfg, episode_sampling="sequential")
    if getattr(cfg, "continuous", None) and cfg.continuous.enabled:
        from soundspaces_tpu.env.continuous import (
            ContinuousAudioNavEnv,
            ContinuousConfig,
        )

        c = cfg.continuous
        tracer = None
        neural_field = None
        if c.rir_source in ("tracer", "neural"):
            from soundspaces_tpu.tools.rir_synth import PoseTracer

            tracer = PoseTracer(
                assets.graph, cfg.data.sampling_rate, cfg.data.rir_max_len,
                num_rays=c.num_rays,
            )
        if c.rir_source in ("tracer3d", "tracer3d_coherent"):
            from soundspaces_tpu.tools.rir_synth import (
                CoherentPoseTracer3D,
                HorizontalPoseAdapter,
                PoseTracer3D,
            )

            if c.rir_source == "tracer3d_coherent":
                # temporal-coherence ray reuse (the reference engine's
                # temporalCoherence, continuous_simulator.py:115-126):
                # ~num_rays/refresh_rays cheaper per step under motion
                t3 = CoherentPoseTracer3D(
                    assets.graph, cfg.data.sampling_rate,
                    cfg.data.rir_max_len, num_rays=c.num_rays,
                    room_height=c.room_height,
                    refresh_rays=c.coherent_refresh_rays or None,
                    max_delta=c.coherent_max_delta,
                )
            else:
                t3 = PoseTracer3D(
                    assets.graph, cfg.data.sampling_rate,
                    cfg.data.rir_max_len, num_rays=c.num_rays,
                    room_height=c.room_height,
                )
            tracer = HorizontalPoseAdapter(
                t3,
                receiver_height=c.receiver_height,
                source_height=c.source_height,
            )
        if c.rir_source == "neural":
            # distill the tracer into an on-device field at setup, then the
            # tracer is no longer needed per step
            from soundspaces_tpu.ops.neural_rir import train_neural_rir_field

            net, params, _, _ = train_neural_rir_field(
                assets.graph, tracer, cfg.data.sampling_rate,
                cfg.data.rir_max_len,
                num_samples=c.neural_distill_samples,
                steps=c.neural_distill_steps, seed=cfg.data.seed,
            )
            neural_field = (net, params)
            tracer = None
        return ContinuousAudioNavEnv(
            ContinuousConfig(
                step_size=c.step_size,
                turn_angle_deg=c.turn_angle_deg,
                step_time=c.step_time,
                use_crossfade=c.use_crossfade,
                success_distance=c.success_distance,
                max_episode_steps=env_cfg.max_episode_steps,
                slack_reward=env_cfg.slack_reward,
                success_reward=env_cfg.success_reward,
                distance_reward_scale=env_cfg.distance_reward_scale,
                sensors=tuple(env_cfg.sensors),
                rir_source=c.rir_source,
                live_depth=c.live_depth,
                depth_size=cfg.data.image_size,
                step_chunks=c.step_chunks,
                episode_sampling=env_cfg.episode_sampling,
                everlasting=env_cfg.everlasting,
                has_distractor_sound=env_cfg.has_distractor_sound,
                num_categories=env_cfg.num_categories,
            ),
            scene, episodes, num_envs or cfg.trainer.num_envs,
            tracer=tracer, neural_field=neural_field,
        )
    return AudioNavEnv(
        env_cfg, scene, episodes, num_envs or cfg.trainer.num_envs
    )


def auto_internal_map_size(points, mapper) -> int:
    """Internal map cells needed to cover the scene from ANY episode start:
    an agent |diam| cells from its start must still register egomap patches
    in-bounds (the reference's fixed 500-cell map assumes Replica
    apartments; MP3D-scale houses overflow it). Rounded up to 100s so
    shapes stay stable across similar scenes; never shrinks the default."""
    pts = np.asarray(points)
    diam = max(
        float(pts[:, 0].max() - pts[:, 0].min()),
        float(pts[:, 2].max() - pts[:, 2].min()),
    )
    need = 2 * int(np.ceil(diam / mapper.map_resolution)) + 2 * mapper.egomap_size
    return max(mapper.internal_map_size, -(-need // 100) * 100)


def build_waypoint_env(
    cfg: ExperimentConfig, assets: SceneAssets, num_envs: int | None = None,
    sequential: bool = False, scene=None, tables=None,
):
    """AV-WaN hierarchical waypoint env over the same assets. Pass
    `scene`/`tables` from an existing env to share the device-resident
    banks (the RIR bank upload and the per-pose egomap/intensity bank
    precompute are expensive at realistic scale — never pay them twice
    for a train/eval pair over the same assets)."""
    import dataclasses as dc

    from soundspaces_tpu.avwan.env import WaypointNavEnv, build_waypoint_tables
    from soundspaces_tpu.avwan.env import WaypointConfig
    from soundspaces_tpu.avwan.maps import MapperConfig

    if scene is None:
        scene = DeviceScene.from_assets(assets)
    split_path = cfg.data.episode_split_path
    if sequential and cfg.data.eval_episode_split_path:
        split_path = cfg.data.eval_episode_split_path
    if not cfg.data.synthetic and split_path:
        # reference-format episode dataset (same resolution path AV-Nav
        # uses; the reference's av_wan trainer likewise consumes the
        # standard AudioNav datasets, av_wan/ppo/ppo_trainer.py)
        episodes = load_episode_bank(cfg, assets, split_path)
    else:
        episodes = make_episode_bank(
            assets, cfg.data.num_episodes, seed=cfg.data.seed + 1,
            min_geodesic_hops=1,
        )
    env_cfg = cfg.env
    if sequential:
        env_cfg = dc.replace(env_cfg, episode_sampling="sequential")
    mapper = MapperConfig(
        action_map_size=cfg.avwan.action_map_size,
        geometric_map_size=cfg.avwan.geometric_map_size,
        acoustic_map_size=cfg.avwan.acoustic_map_size,
    )
    mapper = dc.replace(
        mapper,
        internal_map_size=auto_internal_map_size(assets.graph.points, mapper),
    )
    wp_cfg = WaypointConfig(
        prediction_interval=cfg.avwan.prediction_interval, mapper=mapper,
        plan_from_map=cfg.avwan.plan_from_map,
        egomap_depth_hw=cfg.avwan.egomap_depth_hw,
    )
    if tables is None:
        tables = build_waypoint_tables(assets.graph, mapper)
    return WaypointNavEnv(
        env_cfg, wp_cfg, scene, episodes, tables,
        num_envs or cfg.trainer.num_envs,
    )


def build_multiscene_waypoint_env(
    cfg: ExperimentConfig,
    num_envs: int | None = None,
    sequential: bool = False,
    share_from=None,
):
    """AV-WaN over several scenes: one WaypointNavEnv per scene with its own
    graph-shaped tables, env batch round-robined over scenes
    (avwan/multiscene.py). Pass `share_from` (the train env) when building
    the eval pair so device banks and egomap/intensity precompute aren't
    paid twice."""
    import dataclasses as dc

    from soundspaces_tpu.avwan.env import WaypointConfig, build_waypoint_tables
    from soundspaces_tpu.avwan.maps import MapperConfig
    from soundspaces_tpu.avwan.multiscene import MultiSceneWaypointEnv

    multi_real = not cfg.data.synthetic and bool(cfg.data.scene_root)
    if multi_real:
        scene_names = discover_scenes(cfg)
        make_assets = (
            build_scene_assets if share_from is None else light_scene_assets
        )
        assets_list = [make_assets(cfg, s) for s in scene_names]
    else:
        scene_names = None
        assets_list = [
            build_assets(
                dc.replace(
                    cfg, data=dc.replace(cfg.data, seed=cfg.data.seed + i)
                )
            )
            for i in range(cfg.data.num_scenes)
        ]
    split_path = cfg.data.episode_split_path
    if sequential and cfg.data.eval_episode_split_path:
        split_path = cfg.data.eval_episode_split_path
    if multi_real and split_path:
        banks = [
            load_episode_bank(cfg, a, split_path, content_scenes=(s,))
            for s, a in zip(scene_names, assets_list)
        ]
    else:
        banks = [
            make_episode_bank(
                a, cfg.data.num_episodes, seed=cfg.data.seed + 1 + i,
                min_geodesic_hops=1,
            )
            for i, a in enumerate(assets_list)
        ]
    env_cfg = cfg.env
    if sequential:
        env_cfg = dc.replace(env_cfg, episode_sampling="sequential")
    if share_from is not None:
        scenes = list(share_from.base.scene)
        tables_list = list(share_from.tables())
        wp_cfg = share_from.wp
    else:
        scenes = [DeviceScene.from_assets(a) for a in assets_list]
        mapper = MapperConfig(
            action_map_size=cfg.avwan.action_map_size,
            geometric_map_size=cfg.avwan.geometric_map_size,
            acoustic_map_size=cfg.avwan.acoustic_map_size,
        )
        # the internal map must cover the LARGEST scene so per-env state
        # shapes are identical across scene groups
        mapper = dc.replace(
            mapper,
            internal_map_size=max(
                auto_internal_map_size(a.graph.points, mapper)
                for a in assets_list
            ),
        )
        wp_cfg = WaypointConfig(
            prediction_interval=cfg.avwan.prediction_interval, mapper=mapper,
            plan_from_map=cfg.avwan.plan_from_map,
            egomap_depth_hw=cfg.avwan.egomap_depth_hw,
        )
        tables_list = [
            build_waypoint_tables(a.graph, mapper) for a in assets_list
        ]
    return MultiSceneWaypointEnv(
        env_cfg, wp_cfg, scenes, banks, tables_list,
        num_envs or cfg.trainer.num_envs,
    )


def build_trainer(cfg: ExperimentConfig, mesh=None):
    # multi-scene configs (synthetic scene sets or a reference-layout scene
    # root) build their per-scene assets inside build_env's stacking branch;
    # prebuilding one scene here would silently bypass it
    multi_scene = cfg.data.num_scenes > 1 or (
        not cfg.data.synthetic and bool(cfg.data.scene_root)
    )
    assets = None if multi_scene else build_assets(cfg)
    if cfg.trainer_name in ("AVWanTrainer", "avwan"):
        from soundspaces_tpu.avwan.trainer import AVWanTrainer

        if multi_scene:
            # per-scene envs with their own graph-shaped tables, env batch
            # round-robined over scenes (avwan/multiscene.py)
            env = build_multiscene_waypoint_env(cfg)
            eval_env = build_multiscene_waypoint_env(
                cfg, sequential=True, share_from=env
            )
        else:
            env = build_waypoint_env(cfg, assets)
            eval_env = build_waypoint_env(
                cfg, assets, sequential=True, scene=env.base.scene,
                tables=env.tables(),
            )
        trainer = AVWanTrainer(
            cfg.trainer, cfg.ppo, env, eval_env=eval_env,
            use_gm=cfg.avwan.use_gm, use_am=cfg.avwan.use_am,
            bc_updates=cfg.avwan.bc_updates,
            bc_beta_start=cfg.avwan.bc_beta_start,
            bc_beta_final=cfg.avwan.bc_beta_final,
        )
    elif cfg.trainer_name == "savi":
        import dataclasses

        from soundspaces_tpu.savi.trainer import SAViConfig, SAViTrainer

        if (
            cfg.smt.use_belief_predictor
            and "pointgoal_with_gps_compass" not in cfg.env.sensors
        ):
            # online belief training reads the relative goal location as its
            # regression label (savi/trainer.py step; the reference's belief
            # predictor likewise derives it from task state,
            # ppo_trainer.py:332-404) — not a policy input, so adding it
            # does not change the observation the agent acts on
            cfg = dataclasses.replace(
                cfg,
                env=dataclasses.replace(
                    cfg.env,
                    sensors=tuple(cfg.env.sensors)
                    + ("pointgoal_with_gps_compass",),
                ),
            )
        env = build_env(cfg, assets)
        trainer = SAViTrainer(
            env,
            cfg.ppo,
            SAViConfig(
                memory_size=cfg.smt.memory_size,
                hidden_size=cfg.smt.hidden_size,
                nhead=cfg.smt.nhead,
                use_belief_predictor=cfg.smt.use_belief_predictor,
                online_belief_training=cfg.smt.online_belief_training,
                belief_lr=cfg.smt.belief_lr,
                ablate_beliefs=cfg.smt.ablate_beliefs,
            ),
        )
    else:
        env = build_env(cfg, assets)
        trainer_cls = registry.get_trainer(cfg.trainer_name)
        eval_env = build_env(
            cfg, assets, num_envs=cfg.trainer.num_envs, sequential=True,
            scene=getattr(env, "scene", None),
        )
        trainer = trainer_cls(
            cfg.trainer, cfg.ppo, env, eval_env=eval_env, mesh=mesh
        )
    # checkpoints carry the experiment config for eval-time re-merge
    trainer.experiment_config = cfg
    return trainer
