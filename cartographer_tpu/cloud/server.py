"""MapBuilderServer: gRPC ingestion -> blocking queue -> SLAM thread [HOST].

Reference: cloud/internal/map_builder_server.cc — gRPC handlers enqueue
sensor data into `incoming_data_queue_`; a dedicated SLAM thread drains it
into the MapBuilder (:157-176); local-SLAM results fan out to streaming
subscribers (map_builder_server.h:104-146) and optionally to the
LocalTrajectoryUploader for multi-tier mapping.

Service surface mirrors proto::MapBuilderService
(cloud/proto/map_builder_service.proto:257-352) with msgpack payloads over
grpcio generic handlers.
"""

from __future__ import annotations

import io as pyio
import queue
import threading
from concurrent import futures
from typing import Dict, List, Optional

import grpc
import numpy as np

from cartographer_tpu.cloud import codec
from cartographer_tpu.core.config import MapBuilderServerOptions, TrajectoryBuilderOptions
from cartographer_tpu.mapping.map_builder import MapBuilder

SERVICE = "cartographer_tpu.MapBuilderService"


def _method(name: str) -> str:
    return f"/{SERVICE}/{name}"


class MapBuilderServer:
    def __init__(self, options: MapBuilderServerOptions,
                 trajectory_options: Optional[TrajectoryBuilderOptions] = None):
        self._options = options
        self._default_trajectory_options = trajectory_options or TrajectoryBuilderOptions()
        self.map_builder = MapBuilder(options.map_builder)
        self._incoming: "queue.Queue" = queue.Queue(maxsize=10000)
        self._slam_thread: Optional[threading.Thread] = None
        self._shutdown = threading.Event()
        self._local_slam_subscriptions: List[queue.Queue] = []
        self._global_slam_subscriptions: List[queue.Queue] = []
        self._client_ids: Dict[int, str] = {}
        self._finished: Dict[int, bool] = {}
        # Per-trajectory uplink submap index counter (the reference keeps a
        # single starting_submap_index_ per server, map_builder_server.h —
        # per-trajectory is required for multi-trajectory correctness).
        self._starting_submap_index: Dict[int, int] = {}
        self.num_uploaded_results = 0
        self._lock = threading.Lock()
        self._uploader = None
        if options.uplink_server_address:
            from cartographer_tpu.cloud.uploader import LocalTrajectoryUploader
            self._uploader = LocalTrajectoryUploader(
                options.uplink_server_address, options.upload_batch_size,
                ssl_root_certs_path=(options.ssl_root_certs_path
                                     if options.enable_ssl_encryption else None))

        self._grpc_server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=options.num_grpc_threads))
        self._grpc_server.add_generic_rpc_handlers([self._make_handlers()])
        if options.enable_ssl_encryption:
            # Serve TLS (the reference's async_grpc server credential path;
            # client side mirrored in local_trajectory_uploader.cc:112-118).
            with open(options.ssl_private_key_path, "rb") as f:
                key = f.read()
            with open(options.ssl_certificate_path, "rb") as f:
                cert = f.read()
            creds = grpc.ssl_server_credentials([(key, cert)])
            self.port = self._grpc_server.add_secure_port(
                options.server_address, creds)
        else:
            self.port = self._grpc_server.add_insecure_port(
                options.server_address)
        self._monitoring_server = None
        self.monitoring_port = None

    # ------------------------------------------------------------ lifecycle

    def start(self) -> None:
        if self._uploader is not None:
            self._uploader.start()
        self._start_slam_thread()
        self._start_monitoring_server()
        self._grpc_server.start()

    def shutdown(self) -> None:
        self._shutdown.set()
        self._incoming.put(None)
        if self._slam_thread is not None:
            self._slam_thread.join(timeout=10)
        if self._uploader is not None:
            self._uploader.shutdown()
        if self._monitoring_server is not None:
            self._monitoring_server.shutdown()
        self._grpc_server.stop(grace=1).wait()

    def _start_monitoring_server(self) -> None:
        """Prometheus pull endpoint (map_builder_server_main.cc:42-47 /
        cloud/metrics/prometheus/family_factory.cc): serves the global
        metrics registry's text exposition at /metrics. Requires a
        RegistryFamilyFactory to be installed via metrics.set_global_factory
        (the default null factory exposes nothing)."""
        port = self._options.monitoring_port
        if port is None or port < 0:
            return
        from cartographer_tpu import metrics as m
        if not isinstance(m.GLOBAL_FACTORY, m.RegistryFamilyFactory):
            return
        import http.server

        registry = m.GLOBAL_FACTORY

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                if self.path != "/metrics":
                    self.send_response(404)
                    self.end_headers()
                    return
                body = registry.collect_prometheus().encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):
                pass

        self._monitoring_server = http.server.ThreadingHTTPServer(
            ("0.0.0.0", port), Handler)
        self.monitoring_port = self._monitoring_server.server_address[1]
        threading.Thread(target=self._monitoring_server.serve_forever,
                         daemon=True, name="monitoring").start()

    def wait_for_shutdown(self) -> None:
        self._grpc_server.wait_for_termination()

    def _start_slam_thread(self) -> None:
        def run():
            # ProcessSensorDataQueue (map_builder_server.cc:157-176).
            while not self._shutdown.is_set():
                item = self._incoming.get()
                try:
                    if item is None:
                        break
                    trajectory_id, sensor_id, data = item
                    try:
                        self.map_builder.add_sensor_data(trajectory_id, sensor_id, data)
                    except Exception as e:  # noqa: BLE001
                        # A poisoned sample must not kill the serving thread
                        # (the reference CHECK-crashes the whole process; a
                        # server drops the sample and keeps serving).
                        import logging
                        logging.getLogger(__name__).exception(
                            "dropping sensor data for trajectory %s sensor %s: %s",
                            trajectory_id, sensor_id, e)
                finally:
                    self._incoming.task_done()

        self._slam_thread = threading.Thread(target=run, daemon=True, name="slam")
        self._slam_thread.start()

    # ------------------------------------------------------------ callbacks

    def _on_local_slam_result(self, trajectory_id, time, translation, rotation,
                              matching_result) -> None:
        msg = {
            "trajectory_id": trajectory_id, "time": time,
            "translation": codec._nd(np.asarray(translation)),
            "rotation": codec._nd(np.asarray(rotation)),
        }
        with self._lock:
            subs = list(self._local_slam_subscriptions)
        for q in subs:
            try:
                q.put_nowait(msg)
            except queue.Full:
                pass
        # Multi-tier uplink: package the full insertion result (node data +
        # incremental submap state) exactly as the reference does on each
        # submap insertion (map_builder_server.cc:178-206,
        # CreateSensorDataForLocalSlamResult).
        if (self._uploader is not None
                and getattr(matching_result, "insertion_result", None) is not None):
            from cartographer_tpu.mapping.local_slam_result_data import (
                build_local_slam_result,
            )

            start = self._starting_submap_index.get(trajectory_id, 0)
            data, new_start = build_local_slam_result(
                trajectory_id, matching_result.insertion_result, start,
                is_3d=self._options.map_builder.use_trajectory_builder_3d)
            self._starting_submap_index[trajectory_id] = new_start
            self._uploader.enqueue_local_slam_result(trajectory_id, data)

    # ------------------------------------------------------------ handlers

    def _make_handlers(self):
        def unary(fn):
            return grpc.unary_unary_rpc_method_handler(
                fn, request_deserializer=codec.decode,
                response_serializer=codec.encode)

        def client_stream(fn):
            return grpc.stream_unary_rpc_method_handler(
                fn, request_deserializer=codec.decode,
                response_serializer=codec.encode)

        def server_stream(fn):
            return grpc.unary_stream_rpc_method_handler(
                fn, request_deserializer=codec.decode,
                response_serializer=codec.encode)

        method_handlers = {
            "AddTrajectory": unary(self._add_trajectory),
            "FinishTrajectory": unary(self._finish_trajectory),
            "AddSensorData": client_stream(self._add_sensor_data_stream),
            "AddRangefinderData": client_stream(self._add_sensor_data_stream),
            "AddImuData": client_stream(self._add_sensor_data_stream),
            "AddOdometryData": client_stream(self._add_sensor_data_stream),
            "AddFixedFramePoseData": client_stream(self._add_sensor_data_stream),
            "AddLandmarkData": client_stream(self._add_sensor_data_stream),
            "AddSensorDataBatch": unary(self._add_sensor_data_batch),
            "AddLocalSlamResultBatch": unary(self._add_local_slam_result_batch),
            "DeleteTrajectory": unary(self._delete_trajectory),
            "GetSubmap": unary(self._get_submap_texture),  # SubmapQuery
            "GetSubmapTexture": unary(self._get_submap_texture),
            "GetTrajectoryStates": unary(self._get_trajectory_states),
            "GetLandmarkPoses": unary(self._get_landmark_poses),
            "SetLandmarkPose": unary(self._set_landmark_pose),
            "LoadStateFromFile": unary(self._load_state_from_file),
            "WriteStateToFile": unary(self._write_state_to_file),
            "ReceiveGlobalSlamOptimizations": server_stream(
                self._receive_global_slam_optimizations),
            "GetTrajectoryNodePoses": unary(self._get_trajectory_node_poses),
            "GetAllSubmapPoses": unary(self._get_all_submap_poses),
            "GetConstraints": unary(self._get_constraints),
            "GetLocalToGlobalTransform": unary(self._get_local_to_global),
            "IsTrajectoryFinished": unary(self._is_trajectory_finished),
            "IsTrajectoryFrozen": unary(self._is_trajectory_frozen),
            "RunFinalOptimization": unary(self._run_final_optimization),
            "WriteState": unary(self._write_state),
            "LoadState": unary(self._load_state),
            "ReceiveLocalSlamResults": server_stream(self._receive_local_slam_results),
        }
        return grpc.method_handlers_generic_handler(SERVICE, method_handlers)

    def _add_trajectory(self, request, context):
        expected_sensor_ids = request["expected_sensor_ids"]
        client_id = request.get("client_id", "")
        trajectory_id = self.map_builder.add_trajectory_builder(
            expected_sensor_ids, self._default_trajectory_options,
            local_slam_result_callback=self._on_local_slam_result,
            local_slam_results=request.get("local_slam_results", False))
        with self._lock:
            self._client_ids[trajectory_id] = client_id
            self._finished[trajectory_id] = False
        if self._uploader is not None:
            self._uploader.add_trajectory(trajectory_id, expected_sensor_ids)
        return {"trajectory_id": trajectory_id}

    def _check_client(self, trajectory_id, client_id, context):
        with self._lock:
            expected = self._client_ids.get(trajectory_id)
        if expected is not None and client_id and expected != client_id:
            context.abort(grpc.StatusCode.PERMISSION_DENIED,
                          f"client {client_id} does not own trajectory {trajectory_id}")

    def _add_sensor_data_stream(self, request_iterator, context):
        count = 0
        for request in request_iterator:
            self._check_client(request["trajectory_id"],
                               request.get("client_id", ""), context)
            sensor_id, data = codec.decode_sensor_data(request["sensor_data"])
            self._incoming.put((request["trajectory_id"], sensor_id, data))
            count += 1
        return {"received": count}

    def _add_sensor_data_batch(self, request, context):
        for item in request["sensor_data"]:
            sensor_id, data = codec.decode_sensor_data(item["sensor_data"])
            self._incoming.put((item["trajectory_id"], sensor_id, data))
        return {"received": len(request["sensor_data"])}

    def _add_local_slam_result_batch(self, request, context):
        """Tier-2 ingestion of uplinked local-SLAM results: each result goes
        through the SLAM queue into a pose-graph-only trajectory, exactly the
        reference's AddSensorDataBatch -> EnqueueLocalSlamResultData ->
        LocalSlamResult2D::AddToPoseGraph path
        (cloud/internal/handlers/add_sensor_data_batch_handler.cc:102,
        map_builder_context_impl.cc:27-41)."""
        for item in request["results"]:
            sensor_id, data = codec.decode_sensor_data(item["payload"])
            self._incoming.put((item["trajectory_id"], sensor_id, data))
        with self._lock:
            self.num_uploaded_results += len(request["results"])
        return {"received": len(request["results"])}

    def _finish_trajectory(self, request, context):
        tid = request["trajectory_id"]
        self._drain()
        self.map_builder.finish_trajectory(tid)
        with self._lock:
            self._finished[tid] = True
        if self._uploader is not None:
            self._uploader.finish_trajectory(tid)
        return {}

    def _drain(self) -> None:
        """Block until the SLAM thread has consumed everything enqueued."""
        self._incoming.join()

    def _get_submap_texture(self, request, context):
        """SubmapQuery path (cloud handlers + io/submap_painter.cc): render
        one submap's grid to a grayscale texture. 3D submaps return the
        reference's two-texture response — high- then low-resolution x-ray
        projections (Submap3D::ToResponseProto, submap_3d.cc:310)."""
        self._drain()
        from cartographer_tpu.io.submap_painter import (
            submap_3d_to_textures,
            submap_to_image,
        )
        from cartographer_tpu.mapping.id import SubmapId

        sid = SubmapId(request["trajectory_id"], request["submap_index"])
        entry = self.map_builder.pose_graph.submap_data.get(sid)
        if entry is None:
            context.abort(grpc.StatusCode.NOT_FOUND, f"no submap {sid}")
        submap = entry.submap
        if getattr(submap, "high_grid", None) is not None:
            textures = submap_3d_to_textures(submap)
            primary = textures[0]
            return {
                # Primary (high-resolution) texture stays flat so 2D-era
                # clients render something sensible...
                **{k: primary[k] for k in
                   ("width", "height", "cells", "origin", "resolution")},
                "num_range_data": submap.num_range_data,
                # ...and the full two-texture 3D response rides alongside.
                "textures": textures,
            }
        if getattr(submap, "grid", None) is None:
            context.abort(grpc.StatusCode.NOT_FOUND, f"no finished submap {sid}")
        img, origin = submap_to_image(submap.grid)
        return {
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "cells": img.tobytes(),
            "origin": [float(origin[0]), float(origin[1])],
            "resolution": submap.grid.resolution,
            "num_range_data": submap.num_range_data,
        }

    def _get_trajectory_node_poses(self, request, context):
        self._drain()
        out = []
        for (tid, idx), node in self.map_builder.pose_graph.nodes.items():
            pose = getattr(node, "global_pose_2d", None)
            if pose is not None:
                out.append({"trajectory_id": tid, "node_index": idx,
                            "pose": [float(x) for x in pose]})
            else:
                out.append({"trajectory_id": tid, "node_index": idx,
                            "translation": [float(x) for x in node.global_t],
                            "rotation": [float(x) for x in node.global_q]})
        return {"node_poses": out}

    def _get_all_submap_poses(self, request, context):
        self._drain()
        out = []
        for (tid, idx), entry in self.map_builder.pose_graph.submap_data.items():
            pose = getattr(entry, "global_pose_2d", None)
            if pose is not None:
                out.append({"trajectory_id": tid, "submap_index": idx,
                            "pose": [float(x) for x in pose],
                            "num_range_data": entry.submap.num_range_data})
        return {"submap_poses": out}

    def _get_constraints(self, request, context):
        self._drain()
        out = []
        for c in self.map_builder.pose_graph.constraints:
            out.append({
                "submap_id": [c.submap_id.trajectory_id, c.submap_id.submap_index],
                "node_id": [c.node_id.trajectory_id, c.node_id.node_index],
                "tag": c.tag,
            })
        return {"constraints": out}

    def _get_local_to_global(self, request, context):
        """Reference GetLocalToGlobalTransformHandler: last-submap offset."""
        tid = request["trajectory_id"]
        pg = self.map_builder.pose_graph
        if hasattr(pg, "local_to_global"):
            out = pg.local_to_global(tid)
            if isinstance(out, tuple):  # 3D: (t, q)
                t, q = out
                return {"transform": {"t": [float(x) for x in t],
                                      "q": [float(x) for x in q]}}
            return {"transform": [float(x) for x in out]}
        return {"transform": [0.0, 0.0, 0.0]}

    def _is_trajectory_finished(self, request, context):
        with self._lock:
            return {"is_finished": self._finished.get(request["trajectory_id"], False)}

    def _is_trajectory_frozen(self, request, context):
        pg = self.map_builder.pose_graph
        return {"is_frozen": request["trajectory_id"] in pg._frozen_trajectories}

    def _run_final_optimization(self, request, context):
        self._drain()
        self.map_builder.pose_graph.run_final_optimization()
        return {}

    def _write_state(self, request, context):
        self._drain()
        buf = pyio.BytesIO()
        self.map_builder.serialize_state(buf)
        return {"state": buf.getvalue()}

    def _load_state(self, request, context):
        buf = pyio.BytesIO(request["state"])
        remapping = self.map_builder.load_state(
            buf, load_frozen_state=request.get("load_frozen_state", True))
        return {"trajectory_remapping": {str(k): v for k, v in remapping.items()}}

    def _delete_trajectory(self, request, context):
        tid = request["trajectory_id"]
        with self._lock:
            finished_or_frozen = (
                self._finished.get(tid, False)
                or tid in self.map_builder.pose_graph._frozen_trajectories)
        if not finished_or_frozen:
            # DeleteTrajectoryHandler: only FINISHED or FROZEN trajectories
            # may be deleted (cloud/internal/handlers/delete_trajectory_*).
            context.abort(grpc.StatusCode.FAILED_PRECONDITION,
                          f"trajectory {tid} is not finished or frozen")
        self._drain()
        self.map_builder.pose_graph.delete_trajectory(tid)
        return {}

    def _get_trajectory_states(self, request, context):
        self._drain()
        states = dict(self.map_builder.pose_graph.trajectory_states)
        with self._lock:
            for tid, fin in self._finished.items():
                if fin and states.get(tid) not in ("FROZEN", "DELETED"):
                    states[tid] = "FINISHED"
        return {"trajectory_states": {str(k): v for k, v in states.items()}}

    def _get_landmark_poses(self, request, context):
        self._drain()
        return {"landmark_poses": {
            lid: [float(x) for x in np.asarray(pose).ravel()]
            for lid, pose in
            self.map_builder.pose_graph.get_landmark_poses().items()}}

    def _set_landmark_pose(self, request, context):
        self.map_builder.pose_graph.set_landmark_pose(
            request["landmark_id"], np.asarray(request["pose"], np.float64),
            frozen=request.get("frozen", False))
        return {}

    def _load_state_from_file(self, request, context):
        with open(request["file_path"], "rb") as f:
            remapping = self.map_builder.load_state(
                f, load_frozen_state=request.get("load_frozen_state", True))
        return {"trajectory_remapping": {str(k): v for k, v in remapping.items()}}

    def _write_state_to_file(self, request, context):
        self._drain()
        with open(request["file_path"], "wb") as f:
            self.map_builder.serialize_state(f)
        return {"success": True}

    def _receive_global_slam_optimizations(self, request, context):
        """Server-streaming global-SLAM optimization notifications
        (map_builder_service.proto:289-292); one message per completed
        optimization with the last optimized node/submap indices."""
        q: queue.Queue = queue.Queue(maxsize=100)

        def on_optimization():
            pg = self.map_builder.pose_graph
            msg = {
                "last_optimized_node_index": {
                    str(tid): max((i for (t, i), _ in pg.nodes.items()
                                   if t == tid), default=-1)
                    for tid in {t for (t, _), _ in pg.nodes.items()}},
                "last_optimized_submap_index": {
                    str(tid): max((i for (t, i), _ in pg.submap_data.items()
                                   if t == tid), default=-1)
                    for tid in {t for (t, _), _ in pg.submap_data.items()}},
            }
            try:
                q.put_nowait(msg)
            except queue.Full:
                pass

        self.map_builder.pose_graph.set_global_slam_optimization_callback(
            on_optimization)
        with self._lock:
            self._global_slam_subscriptions.append(q)
        try:
            while context.is_active():
                try:
                    yield q.get(timeout=0.2)
                except queue.Empty:
                    continue
        finally:
            with self._lock:
                self._global_slam_subscriptions.remove(q)
            cbs = self.map_builder.pose_graph._global_optimization_callbacks
            if on_optimization in cbs:
                cbs.remove(on_optimization)

    def _receive_local_slam_results(self, request, context):
        q: queue.Queue = queue.Queue(maxsize=1000)
        with self._lock:
            self._local_slam_subscriptions.append(q)
        try:
            while context.is_active():
                try:
                    msg = q.get(timeout=0.2)
                    yield msg
                except queue.Empty:
                    continue
        finally:
            with self._lock:
                self._local_slam_subscriptions.remove(q)
