"""MapBuilder: top-level factory wiring trajectory builders to the pose graph.

Reference: cartographer/mapping/map_builder.cc + the glue layers
internal/global_trajectory_builder.cc (local SLAM result -> PoseGraph::AddNode)
and internal/collated_trajectory_builder.cc (sensor collation). One class per
reference class, same responsibilities, synchronous execution.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import numpy as np

from cartographer_tpu.core.config import MapBuilderOptions, TrajectoryBuilderOptions
from cartographer_tpu.core.time import Time
from cartographer_tpu.mapping.id import NodeId
from cartographer_tpu.mapping.local_trajectory_builder_2d import (
    LocalTrajectoryBuilder2D,
    MatchingResult,
)
from cartographer_tpu.mapping.pose_graph_2d import PoseGraph2D, TrajectoryNode
from cartographer_tpu.sensor.collator import Collator, TrajectoryCollator
from cartographer_tpu.sensor.data import (
    FixedFramePoseData,
    ImuData,
    LandmarkData,
    OdometryData,
    TimedPointCloudData,
)

# LocalSlamResultCallback(trajectory_id, time, local_pose (t, q), matching_result)
LocalSlamResultCallback = Callable[[int, Time, np.ndarray, np.ndarray, MatchingResult], None]


class GlobalTrajectoryBuilder:
    """Glue: forwards sensor data to local SLAM, feeds results into the pose
    graph (mapping/internal/global_trajectory_builder.cc:36-145)."""

    def __init__(self, trajectory_id: int,
                 local_builder: Optional[LocalTrajectoryBuilder2D],
                 pose_graph: PoseGraph2D,
                 local_slam_result_callback: Optional[LocalSlamResultCallback] = None,
                 submap_controller=None):
        self.trajectory_id = trajectory_id
        self._local = local_builder
        self._pose_graph = pose_graph
        self._callback = local_slam_result_callback
        self._submap_controller = submap_controller
        # RegisterMetrics (global_trajectory_builder.cc:173-179).
        from cartographer_tpu import metrics as m
        self._metric_results = m.GLOBAL_FACTORY.new_counter_family(
            "mapping_global_trajectory_builder_local_slam_results",
            "Local SLAM results").add({})

    def add_local_slam_result(self, data) -> None:
        """Tier-2 path: feed a pre-matched local-SLAM result into the pose
        graph only (global_trajectory_builder.cc AddLocalSlamResultData +
        local_slam_result_2d.cc AddToPoseGraph)."""
        assert self._local is None, (
            "can't add LocalSlamResultData with a local trajectory builder present")
        submaps, finished = [], []
        for rec in data.submaps:
            submap, newly_finished = self._submap_controller.update_submap(rec)
            if submap is None:
                continue  # partially-filled submap we never saw the start of
            submaps.append(submap)
            if newly_finished:
                finished.append(submap)
        if not submaps:
            return  # reference: "Ignoring node"
        n = data.node
        node = TrajectoryNode(
            time=n["time"],
            gravity_alignment=np.asarray(n["gravity_alignment"], np.float64),
            filtered_points=np.asarray(n["filtered_points"], np.float64),
            local_pose_translation=np.asarray(n["local_pose_translation"], np.float64),
            local_pose_rotation=np.asarray(n["local_pose_rotation"], np.float64),
        )
        self._pose_graph.add_node(self.trajectory_id, node, submaps, finished)

    def add_range_data(self, sensor_id: str, data: TimedPointCloudData) -> None:
        result = self._local.add_range_data(sensor_id, data)
        if result is None:
            return
        self._metric_results.increment()
        node_id = None
        if result.insertion_result is not None:
            ir = result.insertion_result
            node = TrajectoryNode(
                time=ir.time,
                gravity_alignment=ir.gravity_alignment,
                filtered_points=np.asarray(
                    ir.filtered_gravity_aligned_point_cloud.to_numpy(), np.float64),
                local_pose_translation=ir.local_pose_translation,
                local_pose_rotation=ir.local_pose_rotation,
            )
            node_id = self._pose_graph.add_node(
                self.trajectory_id, node, ir.insertion_submaps, ir.finished_submaps)
        if self._callback is not None:
            self._callback(
                self.trajectory_id, result.time,
                result.local_pose_translation, result.local_pose_rotation, result)

    def add_imu_data(self, imu_data: ImuData) -> None:
        self._local.add_imu_data(imu_data)
        # (3D also feeds the optimization problem's IMU queue; 2D stores it
        # for the optimization problem when IMU-based residuals are enabled.)

    def add_odometry_data(self, odometry_data: OdometryData) -> None:
        self._local.add_odometry_data(odometry_data)
        self._pose_graph.add_odometry_data(self.trajectory_id, odometry_data)

    def add_fixed_frame_pose_data(self, data: FixedFramePoseData) -> None:
        self._pose_graph.add_fixed_frame_pose_data(self.trajectory_id, data)

    def add_landmark_data(self, data: LandmarkData) -> None:
        self._pose_graph.add_landmark_data(self.trajectory_id, data)

    def finish(self):
        return self._local.finish() if self._local is not None else []


class GlobalTrajectoryBuilder3D:
    """3D glue: local SLAM results -> PoseGraph3D
    (global_trajectory_builder.cc templated over 2D/3D in the reference)."""

    def __init__(self, trajectory_id: int, local_builder, pose_graph,
                 local_slam_result_callback=None, submap_controller=None):
        self.trajectory_id = trajectory_id
        self._local = local_builder
        self._pose_graph = pose_graph
        self._callback = local_slam_result_callback
        self._submap_controller = submap_controller
        # RegisterMetrics (global_trajectory_builder.cc:173-179).
        from cartographer_tpu import metrics as m
        self._metric_results = m.GLOBAL_FACTORY.new_counter_family(
            "mapping_global_trajectory_builder_local_slam_results",
            "Local SLAM results").add({})

    def add_local_slam_result(self, data) -> None:
        """Tier-2 path (local_slam_result_3d.cc AddToPoseGraph)."""
        from cartographer_tpu.mapping.pose_graph_3d import TrajectoryNode3D

        assert self._local is None, (
            "can't add LocalSlamResultData with a local trajectory builder present")
        submaps, finished = [], []
        for rec in data.submaps:
            submap, newly_finished = self._submap_controller.update_submap(rec)
            if submap is None:
                continue
            submaps.append(submap)
            if newly_finished:
                finished.append(submap)
        if not submaps:
            return
        n = data.node
        node = TrajectoryNode3D(
            time=n["time"],
            gravity_alignment=np.asarray(n["gravity_alignment"], np.float64),
            high_res_cloud=np.asarray(n["high_res_cloud"], np.float32),
            low_res_cloud=np.asarray(n["low_res_cloud"], np.float32),
            scan_histogram=np.asarray(n["scan_histogram"], np.float32),
            local_pose_translation=np.asarray(n["local_pose_translation"], np.float64),
            local_pose_rotation=np.asarray(n["local_pose_rotation"], np.float64),
        )
        self._pose_graph.add_node(self.trajectory_id, node, submaps, finished)

    def add_range_data(self, sensor_id: str, data: TimedPointCloudData) -> None:
        from cartographer_tpu.mapping.pose_graph_3d import TrajectoryNode3D

        result = self._local.add_range_data(sensor_id, data)
        if result is None:
            return
        self._metric_results.increment()
        if result.insertion_result is not None:
            ir = result.insertion_result
            node = TrajectoryNode3D(
                time=ir.time,
                gravity_alignment=ir.gravity_alignment,
                high_res_cloud=ir.high_res_cloud,
                low_res_cloud=ir.low_res_cloud,
                scan_histogram=ir.scan_histogram,
                local_pose_translation=ir.local_pose_translation,
                local_pose_rotation=ir.local_pose_rotation,
            )
            self._pose_graph.add_node(
                self.trajectory_id, node, ir.insertion_submaps, ir.finished_submaps)
        if self._callback is not None:
            self._callback(self.trajectory_id, result.time,
                           result.local_pose_translation,
                           result.local_pose_rotation, result)

    def add_imu_data(self, imu_data: ImuData) -> None:
        self._local.add_imu_data(imu_data)
        self._pose_graph.add_imu_data(self.trajectory_id, imu_data)

    def add_odometry_data(self, odometry_data: OdometryData) -> None:
        self._local.add_odometry_data(odometry_data)
        self._pose_graph.add_odometry_data(self.trajectory_id, odometry_data)

    def add_fixed_frame_pose_data(self, data: FixedFramePoseData) -> None:
        self._pose_graph.add_fixed_frame_pose_data(self.trajectory_id, data)

    def add_landmark_data(self, data: LandmarkData) -> None:
        self._pose_graph.add_landmark_data(self.trajectory_id, data)

    def finish(self):
        return self._local.finish() if self._local is not None else []


class MapBuilder:
    """Reference MapBuilderInterface implementation (map_builder.cc)."""

    def __init__(self, options: MapBuilderOptions):
        if not options.use_trajectory_builder_2d and not options.use_trajectory_builder_3d:
            raise ValueError("one of use_trajectory_builder_2d/3d must be set")
        self._options = options
        # Background constraint search + pipelined optimization (reference P2)
        # is the default, exactly as in the reference; completion order makes
        # the sampled constraint set nondeterministic there too.
        threads = (options.num_background_threads
                   if options.async_constraint_search else 0)
        # Multi-chip: shard loop-closure batches over all visible devices
        # (SURVEY.md P1; the reference's thread-pool fan-out,
        # constraint_builder_2d.cc:102-136, is its production path too).
        mesh = None
        import jax
        if jax.process_count() > 1:
            # Multihost (jax.distributed process group): constraint batches
            # and the Schur solve are COLLECTIVE — every process must issue
            # them in the same order, so the pose graph runs synchronously
            # (the reference's cross-machine tier serializes through its
            # work queue too, map_builder_server.cc:157-176).
            threads = 0
        if options.use_device_mesh:
            devices = jax.devices()
            if len(devices) > 1:
                from jax.sharding import Mesh
                mesh = Mesh(np.asarray(devices), ("pairs",))
        if options.use_trajectory_builder_3d:
            from cartographer_tpu.mapping.pose_graph_3d import PoseGraph3D
            mesh_3d = mesh
            if mesh is not None and jax.process_count() > 1:
                # 3D has no cross-process solve path yet; keep its matcher
                # sharding on the process-local devices.
                from jax.sharding import Mesh
                local = jax.local_devices()
                mesh_3d = Mesh(np.asarray(local), ("pairs",)) \
                    if len(local) > 1 else None
            self.pose_graph = PoseGraph3D(options.pose_graph,
                                          num_background_threads=threads,
                                          mesh=mesh_3d)
        else:
            self.pose_graph = PoseGraph2D(options.pose_graph,
                                          num_background_threads=threads,
                                          mesh=mesh)
            ot = options.pose_graph.overlapping_submaps_trimmer_2d
            if ot is not None:
                # map_builder.cc wires the trimmer from pose graph options.
                from cartographer_tpu.mapping.trimmers import (
                    OverlappingSubmapsTrimmer2D,
                )
                self.pose_graph.add_trimmer(OverlappingSubmapsTrimmer2D(
                    fresh_submaps_count=ot.fresh_submaps_count,
                    min_covered_area=ot.min_covered_area,
                    min_added_submaps_count=ot.min_added_submaps_count))
        self._scan_batcher = None  # shared cross-robot dispatcher (serving)
        self._collator = (TrajectoryCollator() if options.collate_by_trajectory
                          else Collator())
        self._builders: Dict[int, GlobalTrajectoryBuilder] = {}
        self._sensor_ids: Dict[int, List[str]] = {}
        self._frozen: List[int] = []

    # ------------------------------------------------------------- trajectories

    def add_trajectory_builder(
        self,
        expected_sensor_ids: List[str],
        trajectory_options: TrajectoryBuilderOptions,
        local_slam_result_callback: Optional[LocalSlamResultCallback] = None,
        local_slam_results: bool = False,
    ) -> int:
        """`local_slam_results=True` creates a pose-graph-only trajectory for
        pre-matched uplinked results — the reference signals this by clearing
        the local-builder options in the uplink AddTrajectory request
        (cloud/internal/handlers/add_trajectory_handler.cc:49-56)."""
        trajectory_id = len(self._builders) + len(self._frozen)
        range_ids = [s for s in expected_sensor_ids
                     if s.startswith("range") or "laser" in s or "points" in s]
        if self._options.use_trajectory_builder_3d:
            local = None
            if not local_slam_results:
                from cartographer_tpu.mapping.local_trajectory_builder_3d import (
                    LocalTrajectoryBuilder3D,
                )
                local = LocalTrajectoryBuilder3D(
                    trajectory_options.trajectory_builder_3d,
                    range_ids or expected_sensor_ids)
            builder = GlobalTrajectoryBuilder3D(
                trajectory_id, local, self.pose_graph, local_slam_result_callback,
                submap_controller=self._submap_controller())
        else:
            local = None
            if not local_slam_results:
                batcher = None
                if self._options.batch_scan_dispatch:
                    if self._scan_batcher is None:
                        from cartographer_tpu.mapping.scan_batcher import (
                            ScanBatcher,
                        )
                        self._scan_batcher = ScanBatcher()
                    batcher = self._scan_batcher
                local = LocalTrajectoryBuilder2D(
                    trajectory_options.trajectory_builder_2d,
                    range_ids or expected_sensor_ids, batcher=batcher)
            builder = GlobalTrajectoryBuilder(
                trajectory_id, local, self.pose_graph, local_slam_result_callback,
                submap_controller=self._submap_controller())
        self._builders[trajectory_id] = builder
        self._sensor_ids[trajectory_id] = list(expected_sensor_ids)

        if trajectory_options.pure_localization_trimmer is not None:
            # Pure localization: keep only the last N submaps of this
            # trajectory — wired for BOTH dimensions like the reference
            # (map_builder.cc:56-73,146).
            from cartographer_tpu.mapping.trimmers import PureLocalizationTrimmer
            self.pose_graph.add_trimmer(PureLocalizationTrimmer(
                trajectory_id,
                trajectory_options.pure_localization_trimmer.max_submaps_to_keep))

        self._collator.add_trajectory(
            trajectory_id, expected_sensor_ids, self._dispatch)
        return trajectory_id

    def _submap_controller(self):
        """Shared per-MapBuilder submap replica store for uplinked results
        (reference: one SubmapController per MapBuilderContext)."""
        if not hasattr(self, "_controller"):
            if self._options.use_trajectory_builder_3d:
                from cartographer_tpu.mapping.local_slam_result_data import (
                    SubmapController3D,
                )
                self._controller = SubmapController3D()
            else:
                from cartographer_tpu.mapping.local_slam_result_data import (
                    SubmapController2D,
                )
                self._controller = SubmapController2D()
        return self._controller

    def _dispatch(self, trajectory_id: int, sensor_id: str, time: Time, data) -> None:
        from cartographer_tpu.mapping.local_slam_result_data import LocalSlamResultData

        builder = self._builders[trajectory_id]
        if isinstance(data, LocalSlamResultData):
            builder.add_local_slam_result(data)
        elif isinstance(data, TimedPointCloudData):
            builder.add_range_data(sensor_id, data)
        elif isinstance(data, ImuData):
            builder.add_imu_data(data)
        elif isinstance(data, OdometryData):
            builder.add_odometry_data(data)
        elif isinstance(data, FixedFramePoseData):
            builder.add_fixed_frame_pose_data(data)
        elif isinstance(data, LandmarkData):
            builder.add_landmark_data(data)
        else:
            raise TypeError(f"unknown sensor data type {type(data)}")

    def add_sensor_data(self, trajectory_id: int, sensor_id: str, data) -> None:
        self._collator.add_sensor_data(trajectory_id, sensor_id, data.time, data)

    def finish_trajectory(self, trajectory_id: int) -> None:
        self._collator.finish_trajectory(trajectory_id)
        self.pose_graph.finish_trajectory(trajectory_id)
        finished_submaps = self._builders[trajectory_id].finish()
        # Register remaining active submaps' grids with the pose graph.
        for (tid, sindex), entry in self.pose_graph.submap_data.items():
            for s in finished_submaps:
                if entry.submap is s:
                    entry.finished = True

    def num_trajectory_builders(self) -> int:
        return len(self._builders)

    def get_trajectory_builder(self, trajectory_id: int) -> GlobalTrajectoryBuilder:
        return self._builders[trajectory_id]

    # ------------------------------------------------------------- state io

    def serialize_state(self, writer_or_path,
                        include_unfinished_submaps: bool = True,
                        format: str = "native") -> None:
        """MapBuilder::SerializeState (map_builder.cc:213-225).

        format "native" writes this package's compact msgpack payloads;
        "carto" writes the reference's proto schema so the C++ reference
        (and its tools) can read the stream (io/carto_pbstream.py).
        """
        from cartographer_tpu.io.pbstream import ProtoStreamWriter
        from cartographer_tpu.io.serialization import serialize_state

        # Drain pending background work so the snapshot is consistent.
        if hasattr(self.pose_graph, "wait_for_optimization"):
            self.pose_graph.wait_for_optimization()
        if hasattr(self.pose_graph, "wait_for_all_computations"):
            self.pose_graph.wait_for_all_computations()
        writer = (writer_or_path if isinstance(writer_or_path, ProtoStreamWriter)
                  else ProtoStreamWriter(writer_or_path))
        if format == "carto":
            from cartographer_tpu.io.carto_pbstream import write_carto_state
            write_carto_state(self.pose_graph, writer, include_unfinished_submaps)
        else:
            serialize_state(self.pose_graph, writer, include_unfinished_submaps)
        writer.close()

    def load_state(self, reader_or_path, load_frozen_state: bool = True) -> Dict[int, int]:
        """MapBuilder::LoadState (map_builder.cc:227-395); returns the
        trajectory-id remapping."""
        from cartographer_tpu.io.pbstream import ProtoStreamReader
        from cartographer_tpu.io.serialization import load_state

        reader = (reader_or_path if isinstance(reader_or_path, ProtoStreamReader)
                  else ProtoStreamReader(reader_or_path))
        records = list(reader)
        from cartographer_tpu.io.carto_pbstream import (
            is_carto_stream,
            load_carto_state,
        )
        if records and is_carto_stream(records[0]):
            # A reference-produced pbstream (proto payloads).
            remapping = load_carto_state(records, self.pose_graph,
                                         frozen=load_frozen_state)
        else:
            remapping = load_state(records, self.pose_graph,
                                   frozen=load_frozen_state)
        for new_id in set(remapping.values()):
            self._frozen.append(new_id)
        reader.close()
        return remapping
