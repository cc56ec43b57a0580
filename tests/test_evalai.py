"""EvalAI-protocol round trip: servicer thread <-> client loop over the
socket channel, same method names/payload schemas as benchmark.py:43-117."""

import threading

import numpy as np
import jax

from soundspaces_tpu.env import AudioNavEnv, DeviceScene, make_episode_bank
from soundspaces_tpu.env.structs import EnvConfig
from soundspaces_tpu.eval.evalai import (
    EnvironmentServicer,
    SocketChannel,
    remote_evaluate,
)
from soundspaces_tpu.scene import make_synthetic_assets


def test_evalai_protocol_round_trip():
    assets = make_synthetic_assets(num_nodes_hint=20, sampling_rate=2000,
                                   rir_max_len=400, image_size=8, seed=61)
    scene = DeviceScene.from_assets(assets)
    eps = make_episode_bank(assets, 8, seed=62)
    env = AudioNavEnv(
        EnvConfig(sensors=("spectrogram", "oracle_action"),
                  max_episode_steps=20, episode_sampling="sequential"),
        scene, eps, 1,
    )
    servicer = EnvironmentServicer(env, num_episodes=2,
                                   max_steps_per_episode=25)
    servicer.serve()
    t = threading.Thread(target=servicer.serve_loop, daemon=True)
    t.start()

    def oracle_agent(rng, obs):
        return int(np.asarray(obs["oracle_action"]).reshape(-1)[0])

    metrics = remote_evaluate(
        oracle_agent, channel=SocketChannel(servicer.address)
    )
    t.join(timeout=30)
    assert metrics["success"] == 1.0
    assert abs(metrics["spl"] - 1.0) < 1e-5
    # the sequential cursor must have advanced across protocol resets —
    # each remote episode is a DISTINCT dataset episode, not a replay of
    # episode 0 (the reference's servicer likewise iterates the dataset)
    assert int(np.asarray(servicer._state.ep_ptr)[0]) >= 2
