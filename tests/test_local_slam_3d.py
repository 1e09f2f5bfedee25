"""End-to-end 3D local SLAM + map-builder tests (reference:
map_builder_test.cc LocalSlam3D / GlobalSlam3D)."""

import math

import numpy as np
import pytest

from cartographer_tpu.core.config import (
    MapBuilderOptions,
    TrajectoryBuilderOptions,
    TrajectoryBuilder3DOptions,
    apply_overrides,
)
from cartographer_tpu.core.time import from_seconds
from cartographer_tpu.mapping.local_trajectory_builder_3d import (
    LocalTrajectoryBuilder3D,
)
from cartographer_tpu.mapping.map_builder import MapBuilder
from cartographer_tpu.sensor.data import ImuData, TimedPointCloudData
from cartographer_tpu.transform import nquat

from test_ops_3d import make_environment_3d


def small_options_3d(**overrides) -> TrajectoryBuilder3DOptions:
    opts = TrajectoryBuilder3DOptions()
    base = {
        "min_range": 0.3,
        "max_range": 15.0,
        "voxel_filter_size": 0.1,
        "high_resolution_adaptive_voxel_filter.min_num_points": 100,
        "low_resolution_adaptive_voxel_filter.min_num_points": 150,
        "submaps.high_resolution": 0.2,
        "submaps.high_resolution_max_range": 12.0,
        "submaps.low_resolution": 0.6,
        "submaps.num_range_data": 12,
        "motion_filter.max_distance_meters": 0.01,
        "motion_filter.max_angle_radians": 0.002,
        "ceres_scan_matcher.max_num_iterations": 10,
        "tpu.scan_capacity": 512,
        "tpu.high_grid_size": 96,
        "tpu.low_grid_size": 48,
    }
    base.update(overrides)
    return apply_overrides(opts, base)


def scan_at_3d(world, pose_t, yaw):
    c, s = np.cos(-yaw), np.sin(-yaw)
    rel = world - np.asarray([*pose_t])[None, :]
    out = rel.copy()
    out[:, 0] = c * rel[:, 0] - s * rel[:, 1]
    out[:, 1] = s * rel[:, 0] + c * rel[:, 1]
    return out.astype(np.float32)


def drive_3d(builder, world, poses, dt=0.1):
    """Feed IMU (level, gravity-only) + scans along the pose sequence."""
    results = []
    t0 = 1_000_000_000
    # Prime the extrapolator with IMU before the first scan.
    for k in range(5):
        builder.add_imu_data(ImuData(
            time=t0 - from_seconds(0.05 * (5 - k)),
            linear_acceleration=np.array([0.0, 0.0, 9.81]),
            angular_velocity=np.zeros(3)))
    for i, (t_xy_z, yaw) in enumerate(poses):
        t = t0 + from_seconds(i * dt)
        scan = scan_at_3d(world, t_xy_z, yaw)
        r = builder.add_range_data("points", TimedPointCloudData(
            time=t, origin=np.zeros(3, np.float32),
            ranges=scan, times=np.zeros(len(scan), np.float32)))
        if r is not None:
            results.append(r)
        # IMU between scans (gravity only; yaw rate for turning poses).
        if i + 1 < len(poses):
            yaw_rate = (poses[i + 1][1] - yaw) / dt
            for k in range(1, 5):
                builder.add_imu_data(ImuData(
                    time=t + from_seconds(dt * k / 5),
                    linear_acceleration=np.array([0.0, 0.0, 9.81]),
                    angular_velocity=np.array([0.0, 0.0, yaw_rate])))
    return results


class TestLocalSlam3D:
    def test_straight_line(self):
        world = make_environment_3d(num=500, seed=1)
        builder = LocalTrajectoryBuilder3D(small_options_3d(), ["points"])
        poses = [(np.array([0.04 * i, 0.0, 0.0]), 0.0) for i in range(15)]
        results = drive_3d(builder, world, poses)
        assert len(results) == 15
        final = results[-1].local_pose_translation
        expected = np.array([0.04 * 14, 0.0, 0.0])
        err = np.linalg.norm(final - expected)
        assert err < 0.12, (final, expected)

    def test_requires_imu(self):
        world = make_environment_3d(num=200, seed=2)
        builder = LocalTrajectoryBuilder3D(small_options_3d(), ["points"])
        r = builder.add_range_data("points", TimedPointCloudData(
            time=1_000_000, origin=np.zeros(3, np.float32),
            ranges=scan_at_3d(world, np.zeros(3), 0.0),
            times=np.zeros(len(world), np.float32)))
        assert r is None  # no IMU yet: 3D cannot start

    def test_submap_rotation_and_finish(self):
        world = make_environment_3d(num=500, seed=3)
        builder = LocalTrajectoryBuilder3D(small_options_3d(), ["points"])
        poses = [(np.array([0.04 * i, 0.0, 0.0]), 0.0) for i in range(26)]
        results = drive_3d(builder, world, poses)
        inserted = [r for r in results if r.insertion_result is not None]
        finished = [s for r in inserted for s in r.insertion_result.finished_submaps]
        assert len(finished) >= 1
        f = finished[0]
        assert f.insertion_finished and f.high_grid is not None
        assert f.num_range_data == 24
        assert f.histogram is not None and f.histogram.sum() > 0


class TestMapBuilder3D:
    def test_pipeline_with_pose_graph(self):
        tb3 = small_options_3d(**{"submaps.num_range_data": 6})
        traj = TrajectoryBuilderOptions(trajectory_builder_3d=tb3)
        mb_opts = apply_overrides(
            MapBuilderOptions(use_trajectory_builder_3d=True), {
                "pose_graph.optimize_every_n_nodes": 10,
                "pose_graph.constraint_builder.sampling_ratio": 1.0,
                "pose_graph.constraint_builder.min_score": 0.35,
                "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.branch_and_bound_depth": 4,
                "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.min_rotational_score": 0.3,
                "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.min_low_resolution_score": 0.3,
                "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.linear_xy_search_window": 1.5,
                "pose_graph.constraint_builder.fast_correlative_scan_matcher_3d.linear_z_search_window": 0.4,
            })
        mb = MapBuilder(mb_opts)
        tid = mb.add_trajectory_builder(["points", "imu"], traj)
        world = make_environment_3d(num=500, seed=4)
        poses = ([(np.array([0.05 * i, 0.0, 0.0]), 0.0) for i in range(10)]
                 + [(np.array([0.5 - 0.05 * i, 0.0, 0.0]), 0.0) for i in range(11)])

        t0 = 1_000_000_000
        for k in range(5):
            mb.add_sensor_data(tid, "imu", ImuData(
                time=t0 - from_seconds(0.05 * (5 - k)),
                linear_acceleration=np.array([0.0, 0.0, 9.81]),
                angular_velocity=np.zeros(3)))
        for i, (t_xyz, yaw) in enumerate(poses):
            t = t0 + from_seconds(i * 0.1)
            mb.add_sensor_data(tid, "points", TimedPointCloudData(
                time=t, origin=np.zeros(3, np.float32),
                ranges=scan_at_3d(world, t_xyz, yaw),
                times=np.zeros(len(world), np.float32)))
            if i + 1 < len(poses):
                for k in range(1, 5):
                    mb.add_sensor_data(tid, "imu", ImuData(
                        time=t + from_seconds(0.1 * k / 5),
                        linear_acceleration=np.array([0.0, 0.0, 9.81]),
                        angular_velocity=np.zeros(3)))
        mb.finish_trajectory(tid)
        mb.pose_graph.run_final_optimization()
        pg = mb.pose_graph
        assert len(pg.nodes) >= 15
        assert len(pg.submap_data) >= 2
        # Out-and-back passes over finished submaps: loop closure fires.
        assert pg.num_inter_constraints() > 0
        # Nodes must stay near the ground-truth out-and-back line.
        errs = []
        for (tt, ni), node in pg.nodes.items():
            gi = round((node.time - t0) / 100_000)
            errs.append(np.linalg.norm(node.global_t - [*poses[gi][0]]))
        assert np.mean(errs) < 0.15, np.mean(errs)
