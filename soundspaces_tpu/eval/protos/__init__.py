"""Vendored EvalAI protocol modules (evaluation.proto + pb2/pb2_grpc)."""

from soundspaces_tpu.eval.protos import evaluation_pb2  # noqa: F401

try:  # grpc is optional at import time
    from soundspaces_tpu.eval.protos import evaluation_pb2_grpc  # noqa: F401
except ImportError:  # pragma: no cover
    evaluation_pb2_grpc = None
