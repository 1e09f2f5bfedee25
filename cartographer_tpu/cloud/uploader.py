"""Multi-tier uplink: batched local-SLAM result upload with fault recovery.

Reference: cloud/internal/local_trajectory_uploader.cc — a lower-tier server
streams batched LocalSlamResultData (node data + incremental submap state)
to an uplink server from a background thread; on RPC failure `TryRecovery`
reconnects (with timeout), drops queued data up to the next fresh submap
(IsNewSubmap, :52-56 and :145-180), and re-creates the uplink trajectories
so state stays consistent. Trajectory ids (including those inside submap
records) are translated local -> uplink at send time (:217-223).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Dict, List, Optional

import grpc

from cartographer_tpu.cloud import codec
from cartographer_tpu.cloud.server import _method
from cartographer_tpu.mapping.local_slam_result_data import (
    LocalSlamResultData,
    is_new_submap,
)

_CONNECT_TIMEOUT_SECONDS = 10.0  # local_trajectory_uploader.cc:38


class LocalTrajectoryUploader:
    def __init__(self, uplink_address: str, batch_size: int = 100,
                 ssl_root_certs_path: str = None):
        """`ssl_root_certs_path` switches the uplink channel to TLS (empty
        string = system roots) — local_trajectory_uploader.cc:112-118."""
        self._address = uplink_address
        self._batch_size = batch_size
        self._ssl_root_certs_path = ssl_root_certs_path
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

    def finish_trajectory(self, local_trajectory_id: int,
                          timeout: Optional[float] = 60.0) -> bool:
        """Enqueue the finish marker and BLOCK until the uploader thread has
        flushed every result queued before it and delivered FinishTrajectory
        to the uplink (drain-on-finish: a trajectory is only observably
        finished once its uploads are). The queue is FIFO, so reaching the
        marker implies all earlier results were sent. Returns False on
        timeout (uplink down and recovery still looping)."""
        flushed = threading.Event()
        self._queue.put(("finish_trajectory", local_trajectory_id, flushed))
        return flushed.wait(timeout) if timeout else True

    def enqueue_local_slam_result(self, trajectory_id: int,
                                  data: LocalSlamResultData) -> None:
        try:
            self._queue.put_nowait(("result", trajectory_id, data))
        except queue.Full:
            pass  # drop on overload; recovery path resyncs state

    def _sensor_id_for(self, local_trajectory_id: int) -> str:
        """GetLocalSlamResultSensorId (local_trajectory_uploader.cc:89-91)."""
        return f"local_slam_result_{local_trajectory_id}"

    # ------------------------------------------------------------ internals

    def _connect(self) -> bool:
        import cartographer_tpu.cloud.uploader as _mod

        try:
            if self._ssl_root_certs_path is not None:
                roots = None
                if self._ssl_root_certs_path:
                    with open(self._ssl_root_certs_path, "rb") as f:
                        roots = f.read()
                self._channel = grpc.secure_channel(
                    self._address,
                    grpc.ssl_channel_credentials(root_certificates=roots))
            else:
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
        """RegisterTrajectory: tier-2 gets a pose-graph-only trajectory (the
        reference clears the local-builder options in the request,
        add_trajectory_handler.cc:49-56)."""
        resp = self._unary("AddTrajectory", {
            "expected_sensor_ids": [self._sensor_id_for(local_id)],
            "client_id": f"uploader-{id(self)}",
            "local_slam_results": True,
        })
        self._local_to_uplink[local_id] = resp["trajectory_id"]

    def _try_recovery(self):
        """Reconnect, skip queued data up to the next fresh submap, and
        re-create the uplink trajectories (local_trajectory_uploader.cc:145-180).
        Returns the first keepable queue item (processed next by the run
        loop), or None."""
        self.num_recoveries += 1
        while not self._shutdown.is_set():
            if self._connect():
                break
            time.sleep(0.5)
        if self._shutdown.is_set():
            return None
        # Skip pending results until one whose last insertion submap is new
        # (num_range_data == 1): the tier-2 SubmapController can only rebuild
        # submaps it saw from their first scan, so anything earlier would be
        # ignored as "partially filled" anyway.
        carry = None
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is None or item[0] != "result" or is_new_submap(item[2]):
                carry = item
                break
        # The uplink may have restarted: re-create all known trajectories.
        known = list(self._local_to_uplink.keys()) or list(
            self._trajectory_sensor_ids.keys())
        self._local_to_uplink.clear()
        for local_id in known:
            self._create_uplink_trajectory(local_id)
        return carry

    def _send_batch(self, batch: List[dict]) -> None:
        self._unary("AddLocalSlamResultBatch", {"results": batch})
        self.num_uploaded += len(batch)

    def _run(self) -> None:
        from collections import deque

        pending: "deque" = deque()
        if not self._connect():
            carry = self._try_recovery()
            if carry is not None:
                pending.append(carry)
        batch: List[dict] = []
        while not self._shutdown.is_set():
            item = pending.popleft() if pending else self._queue.get()
            if item is None:
                break
            try:
                if item[0] == "add_trajectory":
                    self._create_uplink_trajectory(item[1])
                    continue
                if item[0] == "finish_trajectory":
                    try:
                        uplink_id = self._local_to_uplink.get(item[1])
                        if uplink_id is not None:
                            if batch:
                                self._send_batch(batch)
                                batch = []
                            self._unary("FinishTrajectory",
                                        {"trajectory_id": uplink_id})
                    finally:
                        # Wake the flush waiter even on RpcError — a hung
                        # finish_trajectory would deadlock the caller.
                        item[2].set()
                    continue
                _, trajectory_id, data = item
                uplink_id = self._local_to_uplink.get(trajectory_id)
                if uplink_id is None:
                    self._create_uplink_trajectory(trajectory_id)
                    uplink_id = self._local_to_uplink[trajectory_id]
                # Translate trajectory ids inside the submap records
                # (local_trajectory_uploader.cc:217-223).
                for rec in data.submaps:
                    rec.trajectory_id = uplink_id
                batch.append({
                    "trajectory_id": uplink_id,
                    "payload": codec.encode_local_slam_result(
                        self._sensor_id_for(trajectory_id), data),
                })
                if len(batch) >= self._batch_size or self._queue.empty():
                    self._send_batch(batch)
                    batch = []
            except grpc.RpcError:
                batch = []
                carry = self._try_recovery()
                if carry is not None:
                    pending.append(carry)
