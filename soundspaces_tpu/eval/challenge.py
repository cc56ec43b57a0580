"""Benchmark/Challenge API surface (soundspaces/benchmark.py + challenge.py).

Local evaluation runs the batched Benchmark harness; remote evaluation
implements the challenge protocol shape (serialized observation/action
round-trips against an evaluation server) with a pluggable transport —
the reference speaks pickled gRPC to EvalAI (benchmark.py:43-117)."""

from __future__ import annotations

import os
import pickle
from typing import Any, Callable

from soundspaces_tpu.eval.benchmark import Benchmark


class Challenge:
    """`Challenge(config_path).submit(agent)`
    (soundspaces/challenge.py:16-23)."""

    def __init__(self, env, eval_remote: bool = False):
        self._eval_remote = eval_remote
        self.benchmark = Benchmark(env)

    def submit(self, agent_fn: Callable, num_episodes: int | None = None):
        if self._eval_remote:
            return self.remote_evaluate(agent_fn)
        n = num_episodes or int(
            os.environ.get("CHALLENGE_NUM_EPISODES", "500")
        )
        metrics = self.benchmark.evaluate(agent_fn, num_episodes=n)
        for k, v in metrics.items():
            print(f"{k}: {v}")
        return metrics

    def remote_evaluate(self, agent_fn: Callable, transport: Any = None):
        """Remote-eval protocol: the server drives episodes and exchanges
        pickled observations/actions (benchmark.py:70-116). `transport`
        defaults to a TCP connection to $EVALENV_ADDPORT (the reference's
        gRPC EnvironmentStub address variable)."""
        if transport is None:
            transport = SocketTransport()
        import jax

        step = 0
        while True:
            packet = transport.recv_observation()
            if packet is None:
                break
            obs = pickle.loads(packet)
            action = agent_fn(jax.random.PRNGKey(step), obs)
            transport.send_action(pickle.dumps(int(action[0])))
            step += 1
        return pickle.loads(transport.result())


# --------------------------------------------------------------- wire format
def _send_msg(sock, kind: str, payload: bytes):
    data = pickle.dumps((kind, payload))
    sock.sendall(len(data).to_bytes(8, "big") + data)


def _recv_msg(sock):
    head = b""
    while len(head) < 8:
        chunk = sock.recv(8 - len(head))
        if not chunk:
            return None, None
        head += chunk
    n = int.from_bytes(head, "big")
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            return None, None
        buf += chunk
    return pickle.loads(buf)


class SocketTransport:
    """Client side of the remote-eval wire: length-prefixed pickled
    (kind, payload) messages over TCP — the stand-in for the reference's
    pickled-gRPC EnvironmentStub (benchmark.py:70-116)."""

    def __init__(self, addr_port: str | None = None):
        import socket

        addr_port = addr_port or os.environ.get("EVALENV_ADDPORT")
        if not addr_port:
            raise RuntimeError(
                "remote evaluation needs a transport: set $EVALENV_ADDPORT "
                "(host:port of the EvalServer) or pass one explicitly"
            )
        host, port = addr_port.rsplit(":", 1)
        self._sock = socket.create_connection((host, int(port)))
        self._result: bytes | None = None

    def recv_observation(self) -> bytes | None:
        kind, payload = _recv_msg(self._sock)
        if kind == "obs":
            return payload
        if kind == "result":
            self._result = payload
        return None

    def send_action(self, payload: bytes):
        _send_msg(self._sock, "act", payload)

    def result(self) -> bytes:
        assert self._result is not None, "server never sent a result"
        return self._result


class EvalServer:
    """Server side: owns the (single-env) environment, drives episodes, and
    exchanges messages with one remote agent — the EvalAI evaluator role
    (soundspaces/benchmark.py remote protocol)."""

    def __init__(self, env, num_episodes: int = 4, host: str = "127.0.0.1",
                 port: int = 0):
        import socket

        assert env.num_envs == 1, "remote eval drives one env"
        self.env = env
        self.num_episodes = num_episodes
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind((host, port))
        self._listener.listen(1)
        self.address = "{}:{}".format(*self._listener.getsockname())

    def serve_once(self, max_steps_per_episode: int = 500) -> dict:
        """Accept one agent connection, run num_episodes, send the averaged
        metrics, and return them."""
        import jax
        import numpy as np

        sock, _ = self._listener.accept()
        try:
            totals: dict[str, float] = {}
            count = 0
            rng = jax.random.PRNGKey(0)
            state, obs = self.env.reset(rng)
            while count < self.num_episodes:
                for _ in range(max_steps_per_episode):
                    host_obs = {
                        k: np.asarray(v) for k, v in jax.device_get(obs).items()
                    }
                    _send_msg(sock, "obs", pickle.dumps(host_obs))
                    kind, payload = _recv_msg(sock)
                    assert kind == "act", kind
                    action = int(pickle.loads(payload))
                    import jax.numpy as jnp

                    state, obs, _, done, info = self.env.step(
                        state, jnp.asarray([action], jnp.int32)
                    )
                    if bool(np.asarray(done)[0]):
                        count += 1
                        fetched = jax.device_get(info)
                        for k, v in fetched.items():
                            totals[k] = totals.get(k, 0.0) + float(v[0])
                        break
            metrics = {k: v / max(count, 1) for k, v in totals.items()}
            metrics["episode_count"] = float(count)
            _send_msg(sock, "result", pickle.dumps(metrics))
            return metrics
        finally:
            sock.close()
            self._listener.close()
