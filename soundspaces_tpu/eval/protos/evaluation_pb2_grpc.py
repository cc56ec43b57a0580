"""gRPC stubs for evaluation.proto in the grpc_tools-generated style
(the reference's Benchmark.remote_evaluate instantiates
`evaluation_pb2_grpc.EnvironmentStub(channel)`, benchmark.py:72)."""

from __future__ import annotations

import grpc

from soundspaces_tpu.eval.protos import evaluation_pb2

_METHODS = (
    "num_episodes",
    "reset",
    "episode_over",
    "act_on_environment",
    "get_metrics",
    "evalai_update_submission",
)


class EnvironmentStub:
    def __init__(self, channel: grpc.Channel):
        for name in _METHODS:
            setattr(
                self,
                name,
                channel.unary_unary(
                    f"/evaluation.Environment/{name}",
                    request_serializer=evaluation_pb2.Package.SerializeToString,
                    response_deserializer=evaluation_pb2.Package.FromString,
                ),
            )


class EnvironmentServicer:
    """Service base class: override the six methods."""


def _unimplemented(request, context):
    context.set_code(grpc.StatusCode.UNIMPLEMENTED)
    context.set_details("Method not implemented!")
    raise NotImplementedError("Method not implemented!")


for _name in _METHODS:
    setattr(EnvironmentServicer, _name, staticmethod(_unimplemented))


def add_EnvironmentServicer_to_server(servicer, server: grpc.Server):
    rpc_method_handlers = {
        name: grpc.unary_unary_rpc_method_handler(
            getattr(servicer, name),
            request_deserializer=evaluation_pb2.Package.FromString,
            response_serializer=evaluation_pb2.Package.SerializeToString,
        )
        for name in _METHODS
    }
    generic_handler = grpc.method_handlers_generic_handler(
        "evaluation.Environment", rpc_method_handlers
    )
    server.add_generic_rpc_handlers((generic_handler,))
