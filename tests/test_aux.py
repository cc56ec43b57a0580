"""Aux subsystems: tb writer, video generation, preemption snapshot,
pretraining pipeline."""

import os
import signal

import numpy as np
import pytest

import jax

from soundspaces_tpu.scene import make_synthetic_assets


def test_tensorboard_writer(tmp_path):
    from soundspaces_tpu.utils.tb import TensorboardWriter

    with TensorboardWriter(str(tmp_path / "tb")) as w:
        w.add_scalars({"reward": 1.0, "spl": 0.5}, step=1, prefix="train/")
        w.add_video_from_np_images(
            "vid", 1, [np.zeros((8, 8, 3), np.uint8)] * 3, fps=2
        )
    assert any(
        f.startswith("events") for f in os.listdir(tmp_path / "tb")
    )
    # no-op mode
    w2 = TensorboardWriter(None)
    w2.add_scalar("x", 1.0, 0)
    w2.close()


def test_video_with_audio_single_muxed_file(tmp_path):
    """One AVI holds BOTH streams, frame-aligned (the reference's
    images_to_video_with_audio contract, common/utils.py:279-318) — parse
    the RIFF structure back and verify the interleaving and payloads."""
    import struct

    from soundspaces_tpu.utils.video import images_to_video_with_audio

    frames = [np.full((32, 30, 3), i * 20, np.uint8) for i in range(5)]
    audios = [np.random.randn(2, 4000).astype(np.float32) for _ in range(5)]
    vp = images_to_video_with_audio(
        frames, audios, str(tmp_path), "demo", sampling_rate=4000, fps=1
    )
    data = open(vp, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    # walk the movi chunks: must alternate 00db (video) / 01wb (audio)
    movi_at = data.find(b"LIST", 12)
    kinds = []
    pos = data.find(b"movi") + 4
    while pos < len(data) - 8:
        fourcc = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if fourcc == b"idx1":
            break
        kinds.append(fourcc)
        if fourcc == b"00db":
            row_bytes = (30 * 3 + 3) & ~3
            assert size == row_bytes * 32
        if fourcc == b"01wb":
            assert size == 4000 * 4  # 1 s of 2ch int16
        pos += 8 + size + (size % 2)
    assert kinds == [b"00db", b"01wb"] * 5
    # first video chunk's first pixel: frame 0 is all-0 -> BGR 0
    # second frame value 20 everywhere
    assert b"idx1" in data


def test_observations_to_image():
    from soundspaces_tpu.utils.video import observations_to_image

    obs = {
        "depth": np.random.rand(32, 32, 1).astype(np.float32),
        "spectrogram": np.random.rand(65, 26, 2).astype(np.float32),
    }
    img = observations_to_image(obs)
    assert img.dtype == np.uint8 and img.shape[0] == 32 and img.shape[1] > 32


def test_preemption_signal_and_snapshot(tmp_path):
    from soundspaces_tpu.train import preemption

    preemption.EXIT_REQUESTED = False
    preemption.REQUEUE_REQUESTED = False
    preemption.add_signal_handlers()
    os.kill(os.getpid(), signal.SIGUSR1)
    assert preemption.EXIT_REQUESTED and preemption.REQUEUE_REQUESTED

    state = {"params": {"w": np.ones((2, 2), np.float32)}, "update": 7}
    path = preemption.save_interrupted_state(str(tmp_path), state)
    restored = preemption.load_interrupted_state(str(tmp_path), state)
    assert restored["update"] == 7
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), state["params"]["w"]
    )
    preemption.EXIT_REQUESTED = False
    preemption.REQUEUE_REQUESTED = False


def test_trainer_stops_on_preemption(tmp_path):
    """The train loop must checkpoint and stop at the next update boundary
    after a preemption signal (ddppo_trainer.py:250-272 semantics)."""
    from soundspaces_tpu.env import AudioNavEnv, DeviceScene, EnvConfig, make_episode_bank
    from soundspaces_tpu.train import PPOConfig, PPOTrainer, TrainerConfig
    from soundspaces_tpu.train import preemption

    assets = make_synthetic_assets(num_nodes_hint=20, sampling_rate=4000,
                                   rir_max_len=600, image_size=16, seed=71)
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(assets, 16, seed=72)
    env = AudioNavEnv(EnvConfig(sensors=("spectrogram", "depth"),
                                max_episode_steps=10), scene, episodes, 2)
    trainer = PPOTrainer(
        TrainerConfig(num_updates=100, num_envs=2, log_interval=1,
                      checkpoint_interval=1000,
                      checkpoint_folder=str(tmp_path)),
        PPOConfig(num_steps=2, hidden_size=16, ppo_epoch=1, num_mini_batch=1),
        env,
    )
    updates_seen = []
    preemption.EXIT_REQUESTED = False

    def log_fn(update, m):
        updates_seen.append(update)
        if update == 1:
            preemption.EXIT_REQUESTED = True

    trainer.train(jax.random.PRNGKey(0), log_fn=log_fn)
    assert max(updates_seen) <= 2  # stopped right after the signal
    assert any(f.startswith("ckpt.") for f in os.listdir(tmp_path))
    preemption.EXIT_REQUESTED = False


def test_pretraining_pipeline():
    from soundspaces_tpu.savi.pretraining import (
        build_audiogoal_dataset,
        pretrain_audiogoal_predictor,
    )

    assets = make_synthetic_assets(num_nodes_hint=20, sampling_rate=4000,
                                   rir_max_len=600, image_size=8,
                                   num_sounds=3, seed=73)
    ds = build_audiogoal_dataset(assets, num_samples=64, seed=74)
    assert ds["spectrogram"].shape[0] == 64
    assert np.isfinite(ds["spectrogram"]).all()
    res = pretrain_audiogoal_predictor(
        ds, num_categories=21, batch_size=16, num_epochs=4, lr=2e-3
    )
    assert res.history[-1]["ce"] < res.history[0]["ce"]
    assert np.isfinite(res.history[-1]["mse"])


def test_phase_timers():
    import time as _t

    from soundspaces_tpu.utils.profiling import PhaseTimers, device_trace

    pt = PhaseTimers()
    with pt.phase("env"):
        _t.sleep(0.01)
    with pt.phase("model"):
        _t.sleep(0.01)
    s = pt.summary()
    assert s["env"] > 0 and s["model"] > 0
    with device_trace(None):
        pass  # no-op path


def test_evaluate_writes_videos(tmp_path):
    from soundspaces_tpu.env import AudioNavEnv, DeviceScene, EnvConfig, make_episode_bank
    from soundspaces_tpu.train import PPOConfig, PPOTrainer, TrainerConfig

    assets = make_synthetic_assets(num_nodes_hint=20, sampling_rate=4000,
                                   rir_max_len=600, image_size=16, seed=91)
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(assets, 16, seed=92)
    env = AudioNavEnv(
        EnvConfig(sensors=("spectrogram", "audiogoal", "depth"),
                  max_episode_steps=5, episode_sampling="sequential"),
        scene, episodes, 2,
    )
    trainer = PPOTrainer(
        TrainerConfig(num_envs=2),
        PPOConfig(num_steps=2, hidden_size=16, ppo_epoch=1, num_mini_batch=1),
        env,
    )
    params, _, _ = trainer.init_state(jax.random.PRNGKey(0))
    stats = trainer.evaluate(params, num_episodes=2, max_steps=12,
                             video_dir=str(tmp_path))
    import os as _os

    assert stats["episode_count"] >= 1
    avis = [f for f in _os.listdir(tmp_path) if f.endswith(".avi")]
    assert avis  # one muxed file per episode (video + PCM audio inside)
    head = open(tmp_path / avis[0], "rb").read(12)
    assert head[:4] == b"RIFF" and head[8:12] == b"AVI "


def test_top_down_map_render():
    """Top-down map image: walkable/blocked coloring, goal + agent markers
    (plot_top_down_map, ss_baselines/common/utils.py:231-276)."""
    import jax

    from soundspaces_tpu.env import AudioNavEnv, DeviceScene, EnvConfig, make_episode_bank
    from soundspaces_tpu.scene import make_synthetic_assets
    from soundspaces_tpu.utils.video import plot_top_down_map, top_down_map_from_state

    occ = np.zeros((10, 12), np.float32)
    occ[2:8, 3:9] = 1.0
    img = plot_top_down_map(occ, agent_xz=(4, 4), rot_idx=1, goal_xz=(7, 6),
                            trail=[(5, 5)], scale=4)
    assert img.shape == (40, 48, 3) and img.dtype == np.uint8
    assert (img[4 * 4 + 2, 4 * 4 + 2] == [220, 50, 50]).all()  # agent
    assert (img[6 * 4 + 2, 7 * 4 + 2] == [40, 200, 80]).all()  # goal
    assert (img[0, 0] == [40, 40, 48]).all()  # blocked corner

    assets = make_synthetic_assets(num_nodes_hint=12, sampling_rate=4000,
                                   rir_max_len=600, image_size=8, seed=2)
    scene = DeviceScene.from_assets(assets)
    env = AudioNavEnv(EnvConfig(sensors=("spectrogram",)), scene,
                      make_episode_bank(assets, 4, seed=3), 2)
    state, _ = env.reset(jax.random.PRNGKey(0))
    frame = top_down_map_from_state(scene, state, 0)
    assert frame.ndim == 3 and frame.shape[-1] == 3
