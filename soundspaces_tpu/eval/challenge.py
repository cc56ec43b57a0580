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
        must provide recv_observation() -> bytes|None and
        send_action(bytes); None ends the evaluation and returns the
        server's pickled metrics."""
        if transport is None:
            raise RuntimeError(
                "remote evaluation needs a transport (the reference uses a "
                "gRPC EnvironmentStub against $EVALENV_ADDPORT); pass an "
                "object with recv_observation()/send_action()"
            )
        import jax

        while True:
            packet = transport.recv_observation()
            if packet is None:
                break
            obs = pickle.loads(packet)
            action = agent_fn(jax.random.PRNGKey(0), obs)
            transport.send_action(pickle.dumps(int(action[0])))
        return pickle.loads(transport.result())
