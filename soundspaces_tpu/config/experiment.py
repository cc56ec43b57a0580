"""Experiment configuration: yaml -> frozen dataclass tree.

Plays the role of the reference's two-level yacs system — experiment node _C
grafting a task node _TC (ss_baselines/av_nav/config/default.py:25-254) —
with plain frozen dataclasses instead of a mutable global tree. Merge order
matches the reference: dataclass defaults <- yaml file <- dotted CLI opts
(`a.b.c=value` pairs, the reference's CMD_TRAILING_OPTS)."""

from __future__ import annotations

import dataclasses
from typing import Any

import yaml

from soundspaces_tpu.env.structs import EnvConfig
from soundspaces_tpu.train.ppo import PPOConfig
from soundspaces_tpu.train.trainer import TrainerConfig


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Where scene assets come from. `synthetic` generates procedural assets
    (scene/synthetic.py); otherwise point at reference-format data dirs
    (metadata graph.pkl, binaural RIR wavs, sound wavs, frame cache pkl)."""

    synthetic: bool = True
    # scenes per training job: >1 stacks per-scene banks along a leading
    # scene axis and round-robins envs over scenes (MultiSceneEnv — the
    # reference's scene distribution, env_utils.py:65-69). Synthetic scenes
    # use seeds seed, seed+1, ... (real multi-scene: pass assets explicitly)
    num_scenes: int = 1
    # synthetic knobs
    num_nodes_hint: int = 100
    num_goals: int = 4
    num_sounds: int = 2
    max_secs: int = 2
    image_size: int = 128
    modalities: tuple[str, ...] = ("depth",)
    seed: int = 0
    # real-data multi-scene: a reference-layout data root
    # ({root}/metadata/{scene}, {root}/binaural_rirs/{scene},
    # {root}/scene_observations/{scene}.pkl) + the scene list. Scenes default
    # to those discovered from the episode split's content/ dir — exactly how
    # the reference's construct_envs derives its scene set from the dataset
    # before round-robining it over workers (env_utils.py:36-69).
    scene_root: str = ""
    scenes: tuple[str, ...] = ()
    # real-data paths (reference layouts)
    metadata_dir: str = ""
    binaural_rir_dir: str = ""
    source_sound_dir: str = ""
    scene_observation_file: str = ""
    # MP3D .house object annotation: enables the semantic instance->mpcat40
    # mapping for SemanticObjectSensor on real data (mp3d_utils.py:86-192)
    house_file: str = ""
    episode_split_path: str = ""
    # eval-split episode file (the reference's EVAL.SPLIT dataset swap,
    # base_trainer.py:124-157); empty = reuse the training episodes
    eval_episode_split_path: str = ""
    # audio
    sampling_rate: int = 16000
    rir_max_len: int = 8000
    grid_size: float = 0.5
    # episodes (synthetic)
    num_episodes: int = 512


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    split: str = "val"
    episode_count: int = 500
    deterministic: bool = False


@dataclasses.dataclass(frozen=True)
class ContinuousOverrides:
    """CONTINUOUS=True knobs (the reference rewires sim type, step size and
    crossfade, av_nav/config/default.py:216-227)."""

    enabled: bool = False
    step_size: float = 0.25
    turn_angle_deg: float = 10.0
    step_time: float = 0.25
    use_crossfade: bool = True
    success_distance: float = 0.36
    # per-step RIR source: "bank" (precomputed HBM gather), "tracer" (fresh
    # native ray trace at the exact pose, SS2.0's AudioSensor), "tracer3d"
    # (same but the full 3-D engine: floor/ceiling reflections, source
    # heights, elevation cues — csrc/rir_tracer.cpp 3-D section),
    # "tracer3d_coherent" (3-D engine with temporal-coherence ray reuse
    # across steps — the reference's temporalCoherence),
    # "parametric" (on-device closed-form synthesis), or "neural" (a
    # NeuralRIRField distilled from the tracer at setup, then served fully
    # on device)
    rir_source: str = "bank"
    num_rays: int = 500  # indirectRayCount (continuous_simulator.py:123)
    # rir_source="tracer3d_coherent" (temporalCoherence analog,
    # continuous_simulator.py:115-126): fresh rays per call (0 -> rays/10)
    # and the pose delta beyond which a full retrace is forced
    coherent_refresh_rays: int = 0
    coherent_max_delta: float = 0.6
    # tracer3d elevation geometry: ear/source offsets above the local floor
    # (the reference's 1.5 m agent sensor + goal offsets, simulator.py:390)
    # and the flat-ceiling height over the graph floor heightfield
    receiver_height: float = 1.5
    source_height: float = 1.5
    room_height: float = 3.0
    # rir_source="neural" distillation budget (ops/neural_rir.py)
    neural_distill_samples: int = 512
    neural_distill_steps: int = 1000
    # live on-device depth rasterization at the exact pose (ops/raycast.py)
    live_depth: bool = False
    # sequential env chunks inside the jitted step (HBM locality past ~128
    # envs; see EnvConfig.step_chunks)
    step_chunks: int = 1


@dataclasses.dataclass(frozen=True)
class AVWanConfig:
    """AV-WaN waypoint node (av_wan/config/default.py:54,106-206)."""

    prediction_interval: int = 10
    use_gm: bool = True
    use_am: bool = True
    action_map_size: int = 9
    geometric_map_size: int = 200
    acoustic_map_size: int = 20
    # True: plan on the agent-built map (the reference's partially observed
    # setting); False: ground-truth tables (test oracle)
    plan_from_map: bool = True
    egomap_depth_hw: int = 64  # depth-render resolution for the projection
    # DAgger warm-start (avwan/trainer.py): supervised updates against the
    # oracle waypoint chooser (avwan/oracle.py) before the PPO phase, with
    # the executed-action oracle/policy mixture annealed beta_start ->
    # beta_final. 0 = pure PPO (the reference recipe).
    bc_updates: int = 0
    bc_beta_start: float = 1.0
    bc_beta_final: float = 0.25


@dataclasses.dataclass(frozen=True)
class SMTConfig:
    """SAVi SMT + belief-predictor node (savi/config/default.py:26-318)."""

    memory_size: int = 150
    hidden_size: int = 256
    nhead: int = 8
    use_belief_predictor: bool = True
    online_belief_training: bool = True
    belief_lr: float = 1e-4
    # zero the belief inputs the policy sees (predictor still trains) —
    # the savi ablation: smt.ablate_beliefs=true at eval quantifies how
    # much the learned beliefs carry (savi/README.md ablation table)
    ablate_beliefs: bool = False


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    trainer_name: str = "AVNavTrainer"
    env_name: str = "AudioNavEnv"
    model_dir: str = "data/models/run"
    continuous: ContinuousOverrides = dataclasses.field(
        default_factory=ContinuousOverrides
    )
    smt: SMTConfig = dataclasses.field(default_factory=SMTConfig)
    avwan: AVWanConfig = dataclasses.field(default_factory=AVWanConfig)
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    ppo: PPOConfig = dataclasses.field(default_factory=PPOConfig)
    env: EnvConfig = dataclasses.field(default_factory=EnvConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)


def _coerce(value: Any, target_type: Any) -> Any:
    if target_type is tuple or str(target_type).startswith("tuple"):
        return tuple(value) if isinstance(value, (list, tuple)) else (value,)
    return value


def _merge(cfg: Any, updates: dict[str, Any]) -> Any:
    """Recursively dataclasses.replace with a nested dict of overrides."""
    fields = {f.name: f for f in dataclasses.fields(cfg)}
    kwargs = {}
    for key, value in updates.items():
        if key not in fields:
            raise KeyError(
                f"unknown config key {key!r} for {type(cfg).__name__}; "
                f"known: {sorted(fields)}"
            )
        current = getattr(cfg, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            kwargs[key] = _merge(current, value)
        else:
            kwargs[key] = _coerce(value, type(current))
    return dataclasses.replace(cfg, **kwargs)


def _parse_opt_value(raw: str) -> Any:
    try:
        value = yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw
    if isinstance(value, str):
        # YAML 1.1 won't read "5e-5" as a float; people type it anyway
        try:
            return float(value)
        except ValueError:
            return value
    return value


def get_config(
    yaml_path: str | None = None, opts: list[str] | None = None
) -> ExperimentConfig:
    """Build the config tree: defaults <- yaml <- "a.b=c" opt pairs."""
    cfg = ExperimentConfig()
    explicit_count = False
    for node in get_overrides(yaml_path, opts):
        cfg = _merge(cfg, node)
        explicit_count |= "episode_count" in (node.get("eval") or {})
    # eval-split auto-config (savi/config/default.py:279-290): val -> 500
    # episodes (the default), test -> 1000, unless explicitly set
    if cfg.eval.split == "test" and not explicit_count:
        cfg = dataclasses.replace(
            cfg, eval=dataclasses.replace(cfg.eval, episode_count=1000)
        )
    return cfg


def get_overrides(
    yaml_path: str | None = None, opts: list[str] | None = None
) -> list[dict]:
    """The yaml + CLI override dicts in application order, WITHOUT defaults
    — so eval can re-apply them on top of a checkpoint's stored config (the
    reference's CMD_TRAILING_OPTS re-merge, base_trainer.py:124-157)."""
    nodes: list[dict] = []
    if yaml_path:
        with open(yaml_path) as f:
            nodes.append(yaml.safe_load(f) or {})
    for opt in opts or []:
        key, _, raw = opt.partition("=")
        assert raw, f"opt {opt!r} must look like a.b.c=value"
        node: dict[str, Any] = {}
        leaf = node
        parts = key.strip().split(".")
        for p in parts[:-1]:
            leaf[p] = {}
            leaf = leaf[p]
        leaf[parts[-1]] = _parse_opt_value(raw.strip())
        nodes.append(node)
    return nodes


def merge_config(cfg: ExperimentConfig, updates: dict) -> ExperimentConfig:
    """Public recursive merge (checkpoint-config restore path)."""
    return _merge(cfg, updates)
