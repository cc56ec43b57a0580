"""Config system, registry, scripted-agent benchmark, and the CLI surface."""

import json
import os

import numpy as np
import pytest

from soundspaces_tpu.config import ExperimentConfig, get_config


def test_defaults():
    cfg = ExperimentConfig()
    assert cfg.ppo.clip_param == 0.1
    assert cfg.env.success_reward == 10.0
    assert cfg.trainer_name == "AVNavTrainer"


def test_yaml_and_opts_merge(tmp_path):
    p = tmp_path / "exp.yaml"
    p.write_text(
        "trainer_name: PPOTrainer\n"
        "ppo:\n  lr: 1.0e-4\n  num_steps: 32\n"
        "env:\n  sensors: [spectrogram]\n"
        "data:\n  sampling_rate: 44100\n"
    )
    cfg = get_config(str(p), opts=["ppo.lr=5e-5", "trainer.num_envs=8"])
    assert cfg.trainer_name == "PPOTrainer"
    assert cfg.ppo.num_steps == 32
    assert cfg.ppo.lr == pytest.approx(5e-5)  # opts win over yaml
    assert cfg.trainer.num_envs == 8
    assert cfg.env.sensors == ("spectrogram",)
    assert cfg.data.sampling_rate == 44100


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("ppo:\n  learning_rate: 1.0e-4\n")
    with pytest.raises(KeyError, match="learning_rate"):
        get_config(str(p))


def test_registry():
    import soundspaces_tpu.trainers  # noqa: F401
    from soundspaces_tpu.train.trainer import PPOTrainer
    from soundspaces_tpu.utils import registry

    assert registry.get_trainer("AVNavTrainer") is PPOTrainer
    with pytest.raises(KeyError, match="known"):
        registry.get_trainer("NoSuchTrainer")


@pytest.fixture(scope="module")
def bench_env():
    import dataclasses

    from soundspaces_tpu.builder import build_env
    from soundspaces_tpu.config import DataConfig, ExperimentConfig
    from soundspaces_tpu.env.structs import EnvConfig

    cfg = ExperimentConfig(
        data=DataConfig(
            num_nodes_hint=30, sampling_rate=4000, rir_max_len=800,
            image_size=16, num_episodes=64,
        ),
        env=EnvConfig(
            sensors=("spectrogram", "pointgoal_with_gps_compass", "oracle_action"),
            max_episode_steps=30,
            episode_sampling="sequential",
        ),
    )
    return build_env(cfg, num_envs=4)


def test_scripted_agents_ranking(bench_env):
    """Oracle must dominate; goal-follower must beat random — the qualitative
    ordering the reference's simple-agent benchmark exhibits."""
    from soundspaces_tpu.eval import Benchmark
    from soundspaces_tpu.eval.agents import AGENTS

    bench = Benchmark(bench_env)
    oracle = bench.evaluate(AGENTS["oracle"], num_episodes=12)
    random = bench.evaluate(AGENTS["random"], num_episodes=12)
    follower = bench.evaluate(AGENTS["goal_follower"], num_episodes=12)
    assert oracle["success"] == pytest.approx(1.0)
    assert oracle["spl"] == pytest.approx(1.0, abs=1e-5)
    assert oracle["success"] >= follower["success"] >= 0.0
    assert oracle["distance_to_goal"] <= random["distance_to_goal"] + 1e-6


def test_cli_train_smoke(tmp_path):
    """python -m soundspaces_tpu.run --run-type train on a tiny synthetic
    world: writes logs + checkpoints."""
    from soundspaces_tpu.run import main

    exp = tmp_path / "exp.yaml"
    exp.write_text(
        "trainer:\n  num_updates: 2\n  num_envs: 2\n  log_interval: 1\n"
        "  checkpoint_interval: 2\n"
        "ppo:\n  num_steps: 4\n  hidden_size: 16\n  ppo_epoch: 1\n"
        "  num_mini_batch: 1\n"
        "env:\n  sensors: [spectrogram, depth]\n  max_episode_steps: 10\n"
        "data:\n  num_nodes_hint: 20\n  sampling_rate: 4000\n"
        "  rir_max_len: 600\n  image_size: 16\n  num_episodes: 32\n"
    )
    model_dir = tmp_path / "run1"
    main([
        "--run-type", "train", "--exp-config", str(exp),
        "--model-dir", str(model_dir), "--force-cpu",
    ])
    assert (model_dir / "train.log").exists()
    lines = [json.loads(l) for l in (model_dir / "train.log").read_text().splitlines()]
    assert len(lines) >= 2 and np.isfinite(lines[-1]["reward"])
    ckpts = os.listdir(model_dir / "ckpts")
    assert any(c.startswith("ckpt.") for c in ckpts)

    # eval from the written checkpoint
    main([
        "--run-type", "eval", "--exp-config", str(exp),
        "--model-dir", str(model_dir), "--force-cpu",
        "eval.episode_count=4",
    ])
    stats = json.loads((model_dir / "val_stats.json").read_text())
    assert stats["episode_count"] == 4.0


def test_continuous_mode_builder():
    """continuous.enabled=true builds the SS2.0 continuous env (the
    reference's CONTINUOUS=True rewiring, av_nav/config/default.py:216-227)."""
    from soundspaces_tpu.builder import build_env
    from soundspaces_tpu.config import get_config
    from soundspaces_tpu.env.continuous import ContinuousAudioNavEnv

    cfg = get_config(opts=[
        "continuous.enabled=true",
        "data.num_nodes_hint=20", "data.sampling_rate=4410",
        "data.rir_max_len=800", "data.image_size=8", "data.num_episodes=16",
        "env.sensors=[spectrogram]",
    ])
    env = build_env(cfg, num_envs=2)
    assert isinstance(env, ContinuousAudioNavEnv)
    import jax

    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["spectrogram"].shape[0] == 2


def test_cli_avwan_train_smoke(tmp_path):
    """AVWanTrainer via the CLI: waypoint env built from config, trains and
    checkpoints (ss_baselines/av_wan/run.py surface)."""
    from soundspaces_tpu.run import main

    exp = tmp_path / "avwan.yaml"
    exp.write_text(
        "trainer_name: AVWanTrainer\n"
        "trainer:\n  num_updates: 1\n  num_envs: 2\n  log_interval: 1\n"
        "  checkpoint_interval: 1\n"
        "ppo:\n  num_steps: 2\n  hidden_size: 16\n  ppo_epoch: 1\n"
        "  num_mini_batch: 1\n  use_exponential_lr_decay: true\n"
        "avwan:\n  prediction_interval: 4\n"
        "env:\n  max_episode_steps: 8\n"
        "data:\n  num_nodes_hint: 20\n  sampling_rate: 4000\n"
        "  rir_max_len: 600\n  image_size: 8\n  num_episodes: 16\n"
    )
    model_dir = tmp_path / "wan1"
    main([
        "--run-type", "train", "--exp-config", str(exp),
        "--model-dir", str(model_dir), "--force-cpu",
    ])
    lines = [json.loads(l) for l in (model_dir / "train.log").read_text().splitlines()]
    assert lines and np.isfinite(lines[-1]["reward"])
    assert any(c.startswith("ckpt.") for c in os.listdir(model_dir / "ckpts"))


def test_eval_restores_checkpoint_config(tmp_path):
    """Eval rebuilds the experiment from the checkpoint's stored config and
    re-applies CLI opts on top — the reference's eval-config merge
    precedence (base_trainer.py:124-157). The eval here passes NO exp
    config; the model (hidden 24) must come from the checkpoint."""
    from soundspaces_tpu.run import main

    exp = tmp_path / "exp.yaml"
    exp.write_text(
        "trainer:\n  num_updates: 1\n  num_envs: 2\n  log_interval: 1\n"
        "  checkpoint_interval: 1\n"
        "ppo:\n  num_steps: 3\n  hidden_size: 24\n  ppo_epoch: 1\n"
        "  num_mini_batch: 1\n"
        "env:\n  sensors: [spectrogram]\n  max_episode_steps: 8\n"
        "data:\n  num_nodes_hint: 20\n  sampling_rate: 4000\n"
        "  rir_max_len: 600\n  image_size: 8\n  num_episodes: 16\n"
    )
    model_dir = tmp_path / "run"
    main([
        "--run-type", "train", "--exp-config", str(exp),
        "--model-dir", str(model_dir), "--force-cpu",
    ])
    # eval WITHOUT the exp config: hidden_size 24 etc. restored from ckpt;
    # CLI opt overrides the episode count on top
    main([
        "--run-type", "eval", "--model-dir", str(model_dir), "--force-cpu",
        "eval.episode_count=3",
    ])
    stats = json.loads((model_dir / "val_stats.json").read_text())
    assert stats["episode_count"] == 3.0


def test_eval_split_auto_config(tmp_path):
    """val -> 500 episodes (default), test -> 1000, explicit value wins
    (savi/config/default.py:279-290)."""
    assert get_config().eval.episode_count == 500
    p = tmp_path / "t.yaml"
    p.write_text("eval:\n  split: test\n")
    assert get_config(str(p)).eval.episode_count == 1000
    assert get_config(str(p), opts=["eval.episode_count=42"]).eval.episode_count == 42


def test_cli_savi_train_then_poll_eval(tmp_path):
    """SAVi end-to-end through the CLI: train writes checkpoints (policy +
    belief predictor), then --run-type eval --poll finds and evaluates them
    with the restored weights (the BaseRLTrainer poll loop for SAVi)."""
    from soundspaces_tpu.run import main

    exp = tmp_path / "exp.yaml"
    exp.write_text(
        "trainer_name: savi\n"
        "trainer:\n  num_updates: 2\n  num_envs: 2\n  log_interval: 1\n"
        "  checkpoint_interval: 1\n"
        "ppo:\n  num_steps: 2\n  hidden_size: 16\n  ppo_epoch: 1\n"
        "  num_mini_batch: 1\n"
        "smt:\n  memory_size: 4\n  hidden_size: 32\n  nhead: 4\n"
        "env:\n"
        "  sensors: [spectrogram, depth, pose, category,"
        " pointgoal_with_gps_compass]\n"
        "  max_episode_steps: 8\n"
        "data:\n  num_nodes_hint: 16\n  sampling_rate: 4000\n"
        "  rir_max_len: 600\n  image_size: 16\n  num_episodes: 16\n"
    )
    model_dir = tmp_path / "savi_run"
    main([
        "--run-type", "train", "--exp-config", str(exp),
        "--model-dir", str(model_dir), "--force-cpu",
    ])
    ckpts = os.listdir(model_dir / "ckpts")
    assert any(c.startswith("ckpt.") for c in ckpts)

    out = []
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main([
            "--run-type", "eval", "--exp-config", str(exp),
            "--model-dir", str(model_dir), "--force-cpu", "--poll",
            "eval.episode_count=2",
        ])
    for line in buf.getvalue().splitlines():
        try:
            out.append(json.loads(line))
        except json.JSONDecodeError:
            pass
    polled = [o for o in out if "checkpoint" in o]
    assert polled and all(np.isfinite(o["success"]) for o in polled)


def test_cli_continuous_train_smoke(tmp_path):
    """Training end-to-end ON the SS2.0 continuous env via the CLI
    (the reference's CONTINUOUS=True training path)."""
    from soundspaces_tpu.run import main

    exp = tmp_path / "exp.yaml"
    exp.write_text(
        "trainer:\n  num_updates: 2\n  num_envs: 2\n  log_interval: 1\n"
        "  checkpoint_interval: 2\n"
        "ppo:\n  num_steps: 4\n  hidden_size: 16\n  ppo_epoch: 1\n"
        "  num_mini_batch: 1\n"
        "continuous:\n  enabled: true\n"
        "env:\n  sensors: [spectrogram]\n  max_episode_steps: 10\n"
        "data:\n  num_nodes_hint: 20\n  sampling_rate: 4410\n"
        "  rir_max_len: 800\n  image_size: 8\n  num_episodes: 16\n"
    )
    model_dir = tmp_path / "cont1"
    main([
        "--run-type", "train", "--exp-config", str(exp),
        "--model-dir", str(model_dir), "--force-cpu",
    ])
    lines = [
        json.loads(l)
        for l in (model_dir / "train.log").read_text().splitlines()
    ]
    assert len(lines) >= 2 and np.isfinite(lines[-1]["reward"])


def test_continuous_neural_builder():
    """continuous.rir_source=neural: the builder distills the native tracer
    into a NeuralRIRField at setup and the env serves it on device."""
    from soundspaces_tpu.builder import build_env
    from soundspaces_tpu.config import get_config
    from soundspaces_tpu.tools.rir_synth import native_tracer_available

    if not native_tracer_available():
        import pytest

        pytest.skip("no native toolchain")
    cfg = get_config(opts=[
        "continuous.enabled=true", "continuous.rir_source=neural",
        "continuous.neural_distill_samples=48",
        "continuous.neural_distill_steps=60", "continuous.num_rays=80",
        "data.num_nodes_hint=20", "data.sampling_rate=4410",
        "data.rir_max_len=800", "data.image_size=8", "data.num_episodes=16",
        "env.sensors=[spectrogram]",
    ])
    env = build_env(cfg, num_envs=2)
    import jax
    import numpy as np

    state, obs = env.reset(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(obs["spectrogram"])).all()
