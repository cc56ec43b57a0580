from soundspaces_tpu.eval.benchmark import Benchmark, run_benchmark
from soundspaces_tpu.eval.agents import (
    ForwardOnlyAgent,
    GoalFollowerAgent,
    OracleAgent,
    RandomAgent,
    RandomForwardAgent,
)

__all__ = [
    "Benchmark",
    "ForwardOnlyAgent",
    "GoalFollowerAgent",
    "OracleAgent",
    "RandomAgent",
    "RandomForwardAgent",
    "run_benchmark",
]
