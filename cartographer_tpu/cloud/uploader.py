"""Multi-tier uplink: batched local-SLAM result upload with fault recovery.

Reference: cloud/internal/local_trajectory_uploader.cc — a lower-tier server
streams batched local-SLAM results to an uplink server from a background
thread; on RPC failure `TryRecovery` reconnects (with timeout), drops queued
data up to the next fresh batch boundary, and re-creates the uplink
trajectories so state stays consistent (:145-180).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Dict, List, Optional

import grpc

from cartographer_tpu.cloud import codec
from cartographer_tpu.cloud.server import _method

_CONNECT_TIMEOUT_SECONDS = 10.0  # local_trajectory_uploader.cc:38


class LocalTrajectoryUploader:
    def __init__(self, uplink_address: str, batch_size: int = 100):
        self._address = uplink_address
        self._batch_size = batch_size
        self._queue: queue.Queue = queue.Queue(maxsize=10000)
        self._shutdown = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._channel = None
        self._local_to_uplink: Dict[int, int] = {}
        self._trajectory_sensor_ids: Dict[int, List[str]] = {}
        self.num_uploaded = 0
        self.num_recoveries = 0

    # ------------------------------------------------------------ lifecycle

    def start(self) -> None:
        self._thread = threading.Thread(target=self._run, daemon=True, name="uploader")
        self._thread.start()

    def shutdown(self) -> None:
        self._shutdown.set()
        self._queue.put(None)
        if self._thread is not None:
            self._thread.join(timeout=10)
        if self._channel is not None:
            self._channel.close()

    # ------------------------------------------------------------ API

    def add_trajectory(self, local_trajectory_id: int,
                       expected_sensor_ids: List[str]) -> None:
        self._trajectory_sensor_ids[local_trajectory_id] = list(expected_sensor_ids)
        self._queue.put(("add_trajectory", local_trajectory_id))

    def enqueue_local_slam_result(self, trajectory_id: int, msg: dict) -> None:
        try:
            self._queue.put_nowait(("result", trajectory_id, msg))
        except queue.Full:
            pass  # drop on overload; recovery path resyncs state

    # ------------------------------------------------------------ internals

    def _connect(self) -> bool:
        import cartographer_tpu.cloud.uploader as _mod

        try:
            self._channel = grpc.insecure_channel(self._address)
            grpc.channel_ready_future(self._channel).result(
                timeout=_mod._CONNECT_TIMEOUT_SECONDS)
            return True
        except grpc.FutureTimeoutError:
            return False

    def _unary(self, name, request):
        call = self._channel.unary_unary(
            _method(name), request_serializer=codec.encode,
            response_deserializer=codec.decode)
        return call(request, timeout=30)

    def _create_uplink_trajectory(self, local_id: int) -> None:
        resp = self._unary("AddTrajectory", {
            "expected_sensor_ids": self._trajectory_sensor_ids.get(local_id, []),
            "client_id": f"uploader-{id(self)}",
        })
        self._local_to_uplink[local_id] = resp["trajectory_id"]

    def _try_recovery(self) -> None:
        """Reconnect, drop stale queue entries, re-create trajectories
        (local_trajectory_uploader.cc:145-180)."""
        self.num_recoveries += 1
        while not self._shutdown.is_set():
            if self._connect():
                break
            time.sleep(0.5)
        if self._shutdown.is_set():
            return
        # Re-create uplink trajectories; queued results stay pending and are
        # re-mapped to the new uplink trajectory ids at send time (the
        # reference instead skips the queue to the next fresh submap —
        # local_trajectory_uploader.cc:145-180 — because its payloads carry
        # submap state; ours are self-contained pose results).
        known = list(self._local_to_uplink.keys()) or list(
            self._trajectory_sensor_ids.keys())
        self._local_to_uplink.clear()
        for local_id in known:
            self._create_uplink_trajectory(local_id)

    def _run(self) -> None:
        if not self._connect():
            self._try_recovery()
        batch: List[dict] = []
        while not self._shutdown.is_set():
            item = self._queue.get()
            if item is None:
                break
            try:
                if item[0] == "add_trajectory":
                    self._create_uplink_trajectory(item[1])
                    continue
                _, trajectory_id, msg = item
                uplink_id = self._local_to_uplink.get(trajectory_id)
                if uplink_id is None:
                    self._create_uplink_trajectory(trajectory_id)
                    uplink_id = self._local_to_uplink[trajectory_id]
                batch.append({"trajectory_id": uplink_id, "result": msg})
                if len(batch) >= self._batch_size or self._queue.empty():
                    self._unary("AddLocalSlamResultBatch", {"results": batch})
                    self.num_uploaded += len(batch)
                    batch = []
            except grpc.RpcError:
                batch = []
                self._try_recovery()
