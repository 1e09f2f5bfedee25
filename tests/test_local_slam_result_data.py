"""LocalSlamResultData + SubmapController: package tier-1 insertion results,
round-trip through the wire codec, and replay them into a pose-graph-only
MapBuilder (reference: mapping/internal/local_slam_result_2d.cc /
local_slam_result_3d.cc + submap_controller.cc)."""

import numpy as np

from cartographer_tpu.cloud import codec
from cartographer_tpu.core.config import (
    MapBuilderOptions,
    TrajectoryBuilderOptions,
    apply_overrides,
)
from cartographer_tpu.core.time import from_seconds
from cartographer_tpu.mapping.local_slam_result_data import (
    build_local_slam_result,
    is_new_submap,
)
from cartographer_tpu.mapping.map_builder import MapBuilder
from cartographer_tpu.sensor.data import ImuData, TimedPointCloudData

from test_local_slam_2d import make_wall_points, scan_at, small_options
from test_local_slam_3d import make_environment_3d, scan_at_3d, small_options_3d


def _capture_and_replay(mb_opts, traj, drive_fn, is_3d):
    """Run tier-1 locally while capturing uploads; replay into tier-2."""
    uploads = []
    start = {"index": 0}

    def on_result(tid, time, t, q, matching_result):
        if matching_result.insertion_result is None:
            return
        data, start["index"] = build_local_slam_result(
            tid, matching_result.insertion_result, start["index"], is_3d=is_3d)
        # Wire round-trip (what the uploader/tier-2 codec does).
        wire = codec.encode(codec.encode_local_slam_result("local_slam_result_0", data))
        _, decoded = codec.decode_sensor_data(codec.decode(wire))
        uploads.append(decoded)

    tier1 = MapBuilder(mb_opts)
    tid = tier1.add_trajectory_builder(
        ["points", "imu"] if is_3d else ["laser"], traj,
        local_slam_result_callback=on_result)
    drive_fn(tier1, tid)
    tier1.finish_trajectory(tid)

    tier2 = MapBuilder(mb_opts)
    tid2 = tier2.add_trajectory_builder(
        ["local_slam_result_0"], traj, local_slam_results=True)
    for data in uploads:
        tier2.add_sensor_data(tid2, "local_slam_result_0", data)
    return tier1, tier2, uploads


def test_2d_replay_matches_tier1():
    tb2 = small_options(**{"submaps.num_range_data": 5,
                           "motion_filter.max_distance_meters": 0.01})
    traj = TrajectoryBuilderOptions(trajectory_builder_2d=tb2)
    mb_opts = apply_overrides(
        MapBuilderOptions(use_trajectory_builder_2d=True),
        {"pose_graph.optimize_every_n_nodes": 0})
    world = make_wall_points(num=200, seed=3)

    def drive(mb, tid):
        t0 = 1_000_000_000
        for i in range(14):
            scan = scan_at(world, np.array([0.05 * i, 0.0]), 0.0)
            mb.add_sensor_data(tid, "laser", TimedPointCloudData(
                time=t0 + from_seconds(i * 0.1), origin=np.zeros(3, np.float32),
                ranges=scan, times=np.zeros(len(scan), np.float32)))

    tier1, tier2, uploads = _capture_and_replay(mb_opts, traj, drive, is_3d=False)
    assert len(uploads) == 14
    assert is_new_submap(uploads[0])

    pg1, pg2 = tier1.pose_graph, tier2.pose_graph
    assert len(pg2.nodes) == len(pg1.nodes) == 14
    # Local node poses identical (tier-2 replays, it doesn't re-match).
    for (k1, n1), (k2, n2) in zip(pg1.nodes.items(), pg2.nodes.items()):
        np.testing.assert_allclose(
            n1.local_pose_translation, n2.local_pose_translation, atol=1e-9)
    # The first submap finished on both tiers, with a real grid on tier-2.
    finished2 = [e for _, e in pg2.submap_data.items() if e.finished]
    assert len(finished2) == 1
    assert finished2[0].submap.grid is not None
    assert any(c.tag == "INTRA_SUBMAP" for c in pg2.constraints)


def test_2d_mid_stream_join_ignores_partial_submaps():
    """Joining mid-stream (recovery semantics): results whose submaps were
    never seen from scan 1 are dropped until a fresh submap appears
    (submap_controller.cc 'Refusing to create partially filled submap')."""
    tb2 = small_options(**{"submaps.num_range_data": 4,
                           "motion_filter.max_distance_meters": 0.01})
    traj = TrajectoryBuilderOptions(trajectory_builder_2d=tb2)
    mb_opts = apply_overrides(
        MapBuilderOptions(use_trajectory_builder_2d=True),
        {"pose_graph.optimize_every_n_nodes": 0})
    world = make_wall_points(num=200, seed=3)

    def drive(mb, tid):
        t0 = 1_000_000_000
        for i in range(10):
            scan = scan_at(world, np.array([0.05 * i, 0.0]), 0.0)
            mb.add_sensor_data(tid, "laser", TimedPointCloudData(
                time=t0 + from_seconds(i * 0.1), origin=np.zeros(3, np.float32),
                ranges=scan, times=np.zeros(len(scan), np.float32)))

    tier1, _, uploads = _capture_and_replay(mb_opts, traj, drive, is_3d=False)
    # Replay only from result 2 (skipping the fresh-submap start).
    tier2 = MapBuilder(mb_opts)
    tid2 = tier2.add_trajectory_builder(
        ["local_slam_result_0"], traj, local_slam_results=True)
    accepted_from = next(
        i for i in range(2, len(uploads)) if is_new_submap(uploads[i]))
    for data in uploads[2:]:
        tier2.add_sensor_data(tid2, "local_slam_result_0", data)
    # Nodes before the next fresh submap were ignored; later ones accepted.
    assert len(tier2.pose_graph.nodes) == len(uploads) - accepted_from


def test_3d_replay_matches_tier1():
    tb3 = small_options_3d(**{"submaps.num_range_data": 5})
    traj = TrajectoryBuilderOptions(trajectory_builder_3d=tb3)
    mb_opts = apply_overrides(
        MapBuilderOptions(use_trajectory_builder_3d=True),
        {"pose_graph.optimize_every_n_nodes": 0})
    world = make_environment_3d(num=400, seed=4)

    def drive(mb, tid):
        t0 = 1_000_000_000
        for k in range(5):
            mb.add_sensor_data(tid, "imu", ImuData(
                time=t0 - from_seconds(0.05 * (5 - k)),
                linear_acceleration=np.array([0.0, 0.0, 9.81]),
                angular_velocity=np.zeros(3)))
        for i in range(12):
            t = t0 + from_seconds(i * 0.1)
            mb.add_sensor_data(tid, "points", TimedPointCloudData(
                time=t, origin=np.zeros(3, np.float32),
                ranges=scan_at_3d(world, np.array([0.05 * i, 0.0, 0.0]), 0.0),
                times=np.zeros(len(world), np.float32)))
            for k in range(1, 5):
                mb.add_sensor_data(tid, "imu", ImuData(
                    time=t + from_seconds(0.1 * k / 5),
                    linear_acceleration=np.array([0.0, 0.0, 9.81]),
                    angular_velocity=np.zeros(3)))

    tier1, tier2, uploads = _capture_and_replay(mb_opts, traj, drive, is_3d=True)
    assert len(uploads) >= 10
    pg1, pg2 = tier1.pose_graph, tier2.pose_graph
    assert len(pg2.nodes) == len(pg1.nodes)
    for (k1, n1), (k2, n2) in zip(pg1.nodes.items(), pg2.nodes.items()):
        np.testing.assert_allclose(
            n1.local_pose_translation, n2.local_pose_translation, atol=1e-9)
        assert n2.high_res_cloud.shape == n1.high_res_cloud.shape
    finished2 = [e for _, e in pg2.submap_data.items() if e.finished]
    assert len(finished2) >= 1
    assert finished2[0].submap.high_grid is not None
    assert finished2[0].submap.low_grid is not None
