"""Distributed map-builder service (reference: cartographer/cloud/, SURVEY.md §2.8).

gRPC server + client stubs mirroring proto::MapBuilderService's RPC surface
(cloud/proto/map_builder_service.proto:257-352): client-streaming sensor
ingestion into a blocking queue drained by a dedicated SLAM thread,
server-streaming local/global SLAM result subscriptions, state upload/
download, and a multi-tier LocalTrajectoryUploader with reconnect recovery.

Transport note: the reference generates protobuf/gRPC code; this build uses
grpcio generic handlers with msgpack payloads (the runtime image has grpcio
but no protoc codegen) — the RPC names, streaming shapes, and semantics
match the reference service.
"""

from cartographer_tpu.cloud.server import MapBuilderServer
from cartographer_tpu.cloud.client import MapBuilderStub
