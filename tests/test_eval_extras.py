"""Challenge API, best-checkpoint selection, mp3d metadata, interactive demo."""

import io
import json
import sys

import numpy as np
import pytest

import jax


def test_challenge_local(tmp_path):
    from soundspaces_tpu.builder import build_env
    from soundspaces_tpu.config import DataConfig, ExperimentConfig
    from soundspaces_tpu.env.structs import EnvConfig
    from soundspaces_tpu.eval.agents import AGENTS
    from soundspaces_tpu.eval.challenge import Challenge

    cfg = ExperimentConfig(
        data=DataConfig(num_nodes_hint=20, sampling_rate=4000,
                        rir_max_len=600, image_size=8, num_episodes=16),
        env=EnvConfig(sensors=("spectrogram", "oracle_action"),
                      max_episode_steps=20, episode_sampling="sequential"),
    )
    env = build_env(cfg, num_envs=2)
    ch = Challenge(env)
    metrics = ch.submit(AGENTS["oracle"], num_episodes=4)
    assert metrics["success"] == pytest.approx(1.0)

    with pytest.raises(RuntimeError, match="transport"):
        Challenge(env, eval_remote=True).remote_evaluate(AGENTS["oracle"])


def test_best_checkpoint_selection(tmp_path):
    from soundspaces_tpu.eval.selection import find_best_checkpoint, log_eval_result

    assert find_best_checkpoint(str(tmp_path)) is None
    log_eval_result(str(tmp_path), "ckpt.50", {"spl": 0.4, "success": 0.6})
    log_eval_result(str(tmp_path), "ckpt.100", {"spl": 0.7, "success": 0.8})
    log_eval_result(str(tmp_path), "ckpt.150", {"spl": 0.5, "success": 0.9})
    assert find_best_checkpoint(str(tmp_path)) == "ckpt.100"
    assert find_best_checkpoint(str(tmp_path), "success") == "ckpt.150"


def test_house_reader(tmp_path):
    from soundspaces_tpu.scene.mp3d import CATEGORY_INDEX_MAPPING, HouseReader

    assert CATEGORY_INDEX_MAPPING["chair"] == 0
    assert len(CATEGORY_INDEX_MAPPING) == 21
    house = tmp_path / "x.house"
    house.write_text(
        "ASCII 1.0\n"
        # C category_index category_mapping_index name mpcat40_index
        #   mpcat40_name 0 0 0 0 0 (mp3d_utils.py:89)
        "C 3 3 chair 3 chair 0 0 0 0 0\n"
        "C 5 5 sofa 10 sofa 0 0 0 0 0\n"
        # O obj region cat px py pz a0 a0 a0 a1 a1 a1 r0 r1 r2 0...
        "O 0 1 3 1.0 0.5 2.0 1 0 0 0 1 0 0.5 0.5 0.5 0 0 0 0 0 0 0 0\n"
        "O 1 1 5 4.0 0.5 2.0 1 0 0 0 1 0 0.4 0.4 0.4 0 0 0 0 0 0 0 0\n"
    )
    r = HouseReader(str(house))
    assert r.categories[3] == "chair"
    assert r.category_to_mpcat40 == {3: 3, 5: 10}
    assert r.compute_object_to_category_index_mapping() == {0: 3, 1: 5}
    assert r.nearest_object([1.1, 0.5, 2.0]).index == 0
    assert len(r.objects_in_category(5)) == 1
    assert np.allclose(r.objects[1].bbox_radius, [0.4, 0.4, 0.4])
    # raster instance id = object index + 1, 0 = void
    assert r.instance_to_mpcat40_table().tolist() == [0, 3, 10]


def test_interactive_demo_scripted(tmp_path, monkeypatch):
    from soundspaces_tpu.tools import interactive_demo

    monkeypatch.setattr(
        "sys.stdin", io.StringIO("w\na\nw\nd\ns\n")
    )
    interactive_demo.main(["--steps", "6", "--out", str(tmp_path), "--force-cpu"])
    assert any(f.endswith(".avi") for f in __import__("os").listdir(tmp_path))


def test_remote_challenge_over_sockets():
    """Full remote-eval round trip: EvalServer drives episodes over TCP,
    the Challenge client runs the agent and returns the server's metrics
    (the reference's gRPC/EvalAI protocol, benchmark.py:43-117)."""
    import threading

    import jax

    from soundspaces_tpu.env import AudioNavEnv, DeviceScene, EnvConfig, make_episode_bank
    from soundspaces_tpu.eval.agents import OracleAgent
    from soundspaces_tpu.eval.challenge import Challenge, EvalServer, SocketTransport
    from soundspaces_tpu.scene import make_synthetic_assets

    assets = make_synthetic_assets(num_nodes_hint=16, sampling_rate=4000,
                                   rir_max_len=500, image_size=8, seed=51)
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(assets, 8, seed=52, min_geodesic_hops=1)
    env = AudioNavEnv(
        EnvConfig(sensors=("spectrogram", "oracle_action"),
                  episode_sampling="sequential"),
        scene, episodes, num_envs=1,
    )
    server = EvalServer(env, num_episodes=3)
    server_metrics = {}

    def run_server():
        server_metrics.update(server.serve_once(max_steps_per_episode=40))

    t = threading.Thread(target=run_server)
    t.start()
    challenge = Challenge(env, eval_remote=True)
    client_metrics = challenge.remote_evaluate(
        OracleAgent(), transport=SocketTransport(server.address)
    )
    t.join(timeout=60)
    assert client_metrics["episode_count"] == 3.0
    assert client_metrics["success"] == 1.0  # oracle agent always succeeds
    assert client_metrics == server_metrics
