"""EvalAI-protocol round trip: servicer <-> client loop over BOTH channels —
the socket fallback and the real gRPC transport with the vendored
evaluation_pb2/_grpc modules — same method names/payload schemas as
benchmark.py:43-117."""

import threading

import numpy as np
import pytest
import jax

from soundspaces_tpu.env import AudioNavEnv, DeviceScene, make_episode_bank
from soundspaces_tpu.env.structs import EnvConfig
from soundspaces_tpu.eval.evalai import (
    EnvironmentServicer,
    GrpcChannel,
    SocketChannel,
    remote_evaluate,
)
from soundspaces_tpu.scene import make_synthetic_assets


def make_servicer():
    assets = make_synthetic_assets(num_nodes_hint=20, sampling_rate=2000,
                                   rir_max_len=400, image_size=8, seed=61)
    scene = DeviceScene.from_assets(assets)
    eps = make_episode_bank(assets, 8, seed=62)
    env = AudioNavEnv(
        EnvConfig(sensors=("spectrogram", "oracle_action"),
                  max_episode_steps=20, episode_sampling="sequential"),
        scene, eps, 1,
    )
    return EnvironmentServicer(env, num_episodes=2, max_steps_per_episode=25)


def oracle_agent(rng, obs):
    return int(np.asarray(obs["oracle_action"]).reshape(-1)[0])


def check_metrics(servicer, metrics):
    assert metrics["success"] == 1.0
    assert abs(metrics["spl"] - 1.0) < 1e-5
    # the sequential cursor must have advanced across protocol resets —
    # each remote episode is a DISTINCT dataset episode, not a replay of
    # episode 0 (the reference's servicer likewise iterates the dataset)
    assert int(np.asarray(servicer._state.ep_ptr)[0]) >= 2


def test_evalai_protocol_round_trip_socket():
    servicer = make_servicer()
    servicer.serve()
    t = threading.Thread(target=servicer.serve_loop, daemon=True)
    t.start()
    metrics = remote_evaluate(
        oracle_agent, channel=SocketChannel(servicer.address)
    )
    t.join(timeout=30)
    check_metrics(servicer, metrics)


def test_evalai_protocol_round_trip_grpc():
    pytest.importorskip("grpc")
    servicer = make_servicer()
    servicer.serve_grpc()
    try:
        metrics = remote_evaluate(
            oracle_agent, channel=GrpcChannel(servicer.address)
        )
        check_metrics(servicer, metrics)
    finally:
        servicer._grpc_server.stop(0)


def test_package_wire_format_matches_proto3():
    """The vendored Package must produce the exact proto3 bytes a protoc
    gencode would (tag 0x0A, varint length, payload; empty -> b'')."""
    from soundspaces_tpu.eval.protos import evaluation_pb2

    assert evaluation_pb2.Package().SerializeToString() == b""
    payload = b"x" * 300  # forces a 2-byte varint length
    wire = evaluation_pb2.Package(SerializedEntity=payload).SerializeToString()
    assert wire[:1] == b"\x0a"
    assert wire[1:3] == bytes([0xAC, 0x02])  # varint(300)
    assert wire[3:] == payload
    back = evaluation_pb2.Package.FromString(wire)
    assert back.SerializedEntity == payload
    # unknown trailing field (field 2, varint) is skipped, not an error
    back2 = evaluation_pb2.Package.FromString(wire + b"\x10\x05")
    assert back2.SerializedEntity == payload
