"""End-to-end 2D local SLAM test: drive LocalTrajectoryBuilder2D over a
simulated trajectory and assert pose recovery (reference:
mapping/map_builder_test.cc LocalSlam2D + testing/test_helpers.h
GenerateFakeRangeMeasurements)."""

import math

import numpy as np
import pytest

from cartographer_tpu.core.config import (
    TrajectoryBuilder2DOptions,
    apply_overrides,
)
from cartographer_tpu.core.time import from_seconds
from cartographer_tpu.mapping.local_trajectory_builder_2d import (
    LocalTrajectoryBuilder2D,
)
from cartographer_tpu.sensor.data import TimedPointCloudData
from cartographer_tpu.transform import nquat


def small_options(**overrides) -> TrajectoryBuilder2DOptions:
    opts = TrajectoryBuilder2DOptions()
    base = {
        "use_imu_data": False,
        "use_online_correlative_scan_matching": True,
        "max_range": 12.0,
        "submaps.num_range_data": 20,
        "adaptive_voxel_filter.min_num_points": 100,
        "motion_filter.max_distance_meters": 0.05,
        "motion_filter.max_angle_radians": math.radians(0.5),
        "tpu.scan_capacity": 512,
        "tpu.submap_grid_size": 256,
        "tpu.ray_samples": 128,
        "real_time_correlative_scan_matcher.linear_search_window": 0.15,
    }
    base.update(overrides)
    return apply_overrides(opts, base)


def make_wall_points(num=300, seed=0):
    """Static environment: walls of a 10x8 room (offset from cell boundaries)."""
    rng = np.random.RandomState(seed)
    pts = []
    for _ in range(num):
        side = rng.randint(4)
        if side == 0:
            pts.append([5.013, rng.uniform(-4, 4), 0.3])
        elif side == 1:
            pts.append([-4.987, rng.uniform(-4, 4), 0.3])
        elif side == 2:
            pts.append([rng.uniform(-5, 5), 4.013, 0.3])
        else:
            pts.append([rng.uniform(-5, 5), -3.987, 0.3])
    return np.asarray(pts, np.float32)


def scan_at(world_points, pose_t, pose_yaw):
    """Environment points seen from the robot pose (sensor frame)."""
    c, s = np.cos(-pose_yaw), np.sin(-pose_yaw)
    rel = world_points[:, :2] - pose_t[None, :2]
    x = c * rel[:, 0] - s * rel[:, 1]
    y = s * rel[:, 0] + c * rel[:, 1]
    return np.stack([x, y, world_points[:, 2]], -1).astype(np.float32)


def drive_trajectory(builder, world, poses, dt=0.1):
    """Feed scans of `world` from ground-truth `poses`; returns results."""
    results = []
    t0 = 1_000_000_000
    for i, (t_xy, yaw) in enumerate(poses):
        scan = scan_at(world, t_xy, yaw)
        data = TimedPointCloudData(
            time=t0 + from_seconds(i * dt),
            origin=np.zeros(3, np.float32),
            ranges=scan,
            times=np.zeros(len(scan), np.float32),
        )
        r = builder.add_range_data("laser", data)
        if r is not None:
            results.append(r)
    return results


class TestLocalSlam2D:
    def test_straight_line(self):
        world = make_wall_points()
        builder = LocalTrajectoryBuilder2D(small_options(), ["laser"])
        # 1.5 m forward at 0.05 m/scan.
        poses = [(np.array([0.05 * i, 0.0]), 0.0) for i in range(30)]
        results = drive_trajectory(builder, world, poses)
        assert len(results) == 30
        final = results[-1].local_pose_translation
        expected = np.array([0.05 * 29, 0.0, 0.0])
        err = np.linalg.norm(final - expected)
        assert err < 0.1, (final, expected)

    def test_turn_in_place_then_move(self):
        world = make_wall_points()
        builder = LocalTrajectoryBuilder2D(small_options(), ["laser"])
        poses = []
        for i in range(10):  # rotate 0.3 rad over 10 scans
            poses.append((np.array([0.0, 0.0]), 0.03 * i))
        for i in range(10):  # then move along new heading
            yaw = 0.27
            d = 0.05 * i
            poses.append((np.array([d * np.cos(yaw), d * np.sin(yaw)]), yaw))
        results = drive_trajectory(builder, world, poses)
        final = results[-1].local_pose_translation
        final_yaw = nquat.get_yaw(results[-1].local_pose_rotation)
        d = 0.05 * 9
        expected = np.array([d * np.cos(0.27), d * np.sin(0.27), 0.0])
        assert np.linalg.norm(final - expected) < 0.1, (final, expected)
        assert abs(final_yaw - 0.27) < 0.05

    def test_insertion_results_and_submap_rotation(self):
        world = make_wall_points()
        builder = LocalTrajectoryBuilder2D(
            small_options(**{"motion_filter.max_distance_meters": 0.01}), ["laser"])
        poses = [(np.array([0.05 * i, 0.0]), 0.0) for i in range(45)]
        results = drive_trajectory(builder, world, poses)
        inserted = [r for r in results if r.insertion_result is not None]
        assert len(inserted) >= 40  # motion filter keeps all moving poses
        # After 40+ insertions with num_range_data=20 a submap must finish.
        finished = [s for r in inserted for s in r.insertion_result.finished_submaps]
        assert len(finished) >= 1
        assert finished[0].insertion_finished
        assert finished[0].grid is not None
        # The finished grid has seen 2*num_range_data scans.
        assert finished[0].num_range_data == 40

    def test_waits_for_imu_when_configured(self):
        world = make_wall_points()
        builder = LocalTrajectoryBuilder2D(small_options(**{"use_imu_data": True}), ["laser"])
        data = TimedPointCloudData(
            time=1_000_000, origin=np.zeros(3, np.float32),
            ranges=scan_at(world, np.zeros(2), 0.0),
            times=np.zeros(len(world), np.float32))
        assert builder.add_range_data("laser", data) is None
