"""Client stubs: MapBuilderInterface over gRPC [HOST].

Reference: cloud/client/map_builder_stub.{h,cc}, trajectory_builder_stub,
pose_graph_stub — location transparency: callers can't tell a stub from the
local MapBuilder. Sensor data flows through a client-streaming RPC with a
background upload thread per trajectory.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, List, Optional

import grpc
import numpy as np

from cartographer_tpu.cloud import codec
from cartographer_tpu.cloud.server import SERVICE, _method


class _SensorStream:
    """Background client-streaming sender (trajectory_builder_stub.cc)."""

    def __init__(self, channel, trajectory_id: int, client_id: str):
        self._queue: queue.Queue = queue.Queue(maxsize=1000)
        self._trajectory_id = trajectory_id
        self._client_id = client_id
        self._call = channel.stream_unary(
            _method("AddSensorData"),
            request_serializer=codec.encode,
            response_deserializer=codec.decode,
        )
        self._done = object()
        self._result = None

        def gen():
            while True:
                item = self._queue.get()
                if item is self._done:
                    return
                yield item

        self._future = self._call.future(gen())

    def add(self, sensor_id: str, data) -> None:
        self._queue.put({
            "trajectory_id": self._trajectory_id,
            "client_id": self._client_id,
            "sensor_data": codec.encode_sensor_data(sensor_id, data),
        })

    def finish(self):
        self._queue.put(self._done)
        return self._future.result(timeout=60)


class TrajectoryBuilderStub:
    def __init__(self, stream: _SensorStream):
        self._stream = stream

    def add_sensor_data(self, sensor_id: str, data) -> None:
        self._stream.add(sensor_id, data)


class PoseGraphStub:
    """PoseGraphInterface over gRPC (cloud/internal/client/pose_graph_stub.cc)."""

    def __init__(self, channel):
        self._channel = channel

    def _unary(self, name, request):
        call = self._channel.unary_unary(
            _method(name), request_serializer=codec.encode,
            response_deserializer=codec.decode)
        return call(request, timeout=120)

    def run_final_optimization(self) -> None:
        self._unary("RunFinalOptimization", {})

    def get_trajectory_node_poses(self) -> List[dict]:
        return self._unary("GetTrajectoryNodePoses", {})["node_poses"]

    def get_all_submap_poses(self) -> List[dict]:
        return self._unary("GetAllSubmapPoses", {})["submap_poses"]

    def get_constraints(self) -> List[dict]:
        return self._unary("GetConstraints", {})["constraints"]

    def get_submap_texture(self, trajectory_id: int, submap_index: int) -> dict:
        """SubmapQuery: grayscale occupancy texture of a finished submap."""
        return self._unary("GetSubmapTexture", {
            "trajectory_id": trajectory_id, "submap_index": submap_index})

    def is_trajectory_finished(self, trajectory_id: int) -> bool:
        return self._unary("IsTrajectoryFinished",
                           {"trajectory_id": trajectory_id})["is_finished"]

    def is_trajectory_frozen(self, trajectory_id: int) -> bool:
        return self._unary("IsTrajectoryFrozen",
                           {"trajectory_id": trajectory_id})["is_frozen"]

    def get_trajectory_states(self) -> Dict[int, str]:
        resp = self._unary("GetTrajectoryStates", {})
        return {int(k): v for k, v in resp["trajectory_states"].items()}

    def get_landmark_poses(self) -> Dict[str, list]:
        return self._unary("GetLandmarkPoses", {})["landmark_poses"]

    def get_local_to_global_transform(self, trajectory_id: int):
        """Local→global offset of a trajectory ([x,y,theta] 2D or {t,q} 3D)."""
        return self._unary("GetLocalToGlobalTransform",
                           {"trajectory_id": trajectory_id})["transform"]

    def set_landmark_pose(self, landmark_id: str, pose, frozen: bool = False) -> None:
        self._unary("SetLandmarkPose", {
            "landmark_id": landmark_id,
            "pose": [float(x) for x in np.asarray(pose).ravel()],
            "frozen": frozen})

    def delete_trajectory(self, trajectory_id: int) -> None:
        self._unary("DeleteTrajectory", {"trajectory_id": trajectory_id})


class MapBuilderStub:
    """MapBuilderInterface over gRPC (cloud/client/map_builder_stub.cc)."""

    def __init__(self, server_address: str, client_id: str = "client",
                 ssl_root_certs_path: str = None):
        """`ssl_root_certs_path` switches the channel to TLS, verifying the
        server against the given PEM roots (empty string = system roots) —
        the client side of the reference's SSL channel credentials
        (local_trajectory_uploader.cc:112-118)."""
        if ssl_root_certs_path is not None:
            roots = None
            if ssl_root_certs_path:
                with open(ssl_root_certs_path, "rb") as f:
                    roots = f.read()
            self._channel = grpc.secure_channel(
                server_address,
                grpc.ssl_channel_credentials(root_certificates=roots))
        else:
            self._channel = grpc.insecure_channel(server_address)
        self._client_id = client_id
        self.pose_graph = PoseGraphStub(self._channel)
        self._streams: Dict[int, _SensorStream] = {}
        self._builders: Dict[int, TrajectoryBuilderStub] = {}

    def _unary(self, name, request):
        call = self._channel.unary_unary(
            _method(name), request_serializer=codec.encode,
            response_deserializer=codec.decode)
        return call(request, timeout=120)

    def add_trajectory_builder(self, expected_sensor_ids: List[str],
                               trajectory_options=None,
                               local_slam_result_callback=None) -> int:
        resp = self._unary("AddTrajectory", {
            "expected_sensor_ids": list(expected_sensor_ids),
            "client_id": self._client_id,
        })
        trajectory_id = resp["trajectory_id"]
        stream = _SensorStream(self._channel, trajectory_id, self._client_id)
        self._streams[trajectory_id] = stream
        self._builders[trajectory_id] = TrajectoryBuilderStub(stream)
        return trajectory_id

    def get_trajectory_builder(self, trajectory_id: int) -> TrajectoryBuilderStub:
        return self._builders[trajectory_id]

    def add_sensor_data(self, trajectory_id: int, sensor_id: str, data) -> None:
        self._streams[trajectory_id].add(sensor_id, data)

    def finish_trajectory(self, trajectory_id: int) -> None:
        stream = self._streams.pop(trajectory_id, None)
        if stream is not None:
            stream.finish()
        self._unary("FinishTrajectory", {"trajectory_id": trajectory_id})

    def num_trajectory_builders(self) -> int:
        return len(self._builders)

    def receive_local_slam_results(self):
        """Server-streaming subscription; yields result dicts."""
        call = self._channel.unary_stream(
            _method("ReceiveLocalSlamResults"),
            request_serializer=codec.encode,
            response_deserializer=codec.decode)
        return call({})

    def receive_global_slam_optimizations(self):
        """Server-streaming subscription to global optimization events."""
        call = self._channel.unary_stream(
            _method("ReceiveGlobalSlamOptimizations"),
            request_serializer=codec.encode,
            response_deserializer=codec.decode)
        return call({})

    def write_state(self) -> bytes:
        return self._unary("WriteState", {})["state"]

    def load_state(self, state: bytes, load_frozen_state: bool = True) -> Dict[str, int]:
        return self._unary("LoadState", {
            "state": state, "load_frozen_state": load_frozen_state,
        })["trajectory_remapping"]

    def load_state_from_file(self, file_path: str,
                             load_frozen_state: bool = True) -> Dict[str, int]:
        return self._unary("LoadStateFromFile", {
            "file_path": file_path, "load_frozen_state": load_frozen_state,
        })["trajectory_remapping"]

    def write_state_to_file(self, file_path: str) -> bool:
        return self._unary("WriteStateToFile",
                           {"file_path": file_path})["success"]

    def close(self) -> None:
        self._channel.close()
