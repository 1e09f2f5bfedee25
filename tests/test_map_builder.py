"""Full-pipeline 2D test: MapBuilder over a loop trajectory with loop closure
and pose-graph optimization (reference: mapping/map_builder_test.cc
GlobalSlam2D / pose_graph_2d_test.cc)."""

import math

import numpy as np
import pytest

from cartographer_tpu.core.config import (
    MapBuilderOptions,
    TrajectoryBuilderOptions,
    apply_overrides,
)
from cartographer_tpu.core.time import from_seconds
from cartographer_tpu.sensor.data import TimedPointCloudData
from cartographer_tpu.mapping.map_builder import MapBuilder
from cartographer_tpu.mapping.id import NodeId

from test_local_slam_2d import make_wall_points, scan_at, small_options


def build_options():
    tb2 = small_options(**{
        "submaps.num_range_data": 8,
        "motion_filter.max_distance_meters": 0.01,
    })
    traj = TrajectoryBuilderOptions(trajectory_builder_2d=tb2)
    mb = MapBuilderOptions(use_trajectory_builder_2d=True)
    mb = apply_overrides(mb, {
        "pose_graph.optimize_every_n_nodes": 12,
        "pose_graph.constraint_builder.sampling_ratio": 0.5,
        "pose_graph.constraint_builder.max_constraint_distance": 8.0,
        "pose_graph.constraint_builder.min_score": 0.5,
        "pose_graph.constraint_builder.fast_correlative_scan_matcher.linear_search_window": 2.0,
        "pose_graph.constraint_builder.fast_correlative_scan_matcher.angular_search_window": math.radians(15.0),
        "pose_graph.constraint_builder.fast_correlative_scan_matcher.branch_and_bound_depth": 5,
        "pose_graph.constraint_builder.fast_correlative_scan_matcher.max_scan_range": 12.0,
        "pose_graph.constraint_builder.fast_correlative_scan_matcher.beam_width": 1024,
    })
    return mb, traj


def square_loop_poses(side=0.6, steps_per_side=12, turn_steps=8):
    """Ground-truth square loop returning to the origin, with gradual corner
    turns (a single-scan pi/2 jump exceeds every matcher window) and 5 cm
    steps (the constant-velocity extrapolator needs physically smooth motion:
    like the reference, the Gauss-Newton translation anchor out-pulls the
    occupied-space term when the prediction error approaches 2 grid cells)."""
    poses = []
    headings = [0.0, np.pi / 2, np.pi, 3 * np.pi / 2]
    corners = [np.array([0.0, 0.0]), np.array([side, 0.0]),
               np.array([side, side]), np.array([0.0, side])]
    for leg in range(4):
        yaw = headings[leg]
        for i in range(steps_per_side):
            d = side * i / steps_per_side
            t = corners[leg] + d * np.array([np.cos(yaw), np.sin(yaw)])
            poses.append((t, yaw))
        # Turn in place at the next corner.
        next_yaw = headings[(leg + 1) % 4] + (2 * np.pi if leg == 3 else 0.0)
        for i in range(1, turn_steps):
            poses.append((corners[(leg + 1) % 4],
                          yaw + (next_yaw - yaw) * i / turn_steps))
    poses.append((np.array([0.0, 0.0]), 2 * np.pi))
    return poses


class TestMapBuilder2D:
    def test_global_slam_loop(self):
        mb_options, traj_options = build_options()
        mb = MapBuilder(mb_options)
        results = []
        tid = mb.add_trajectory_builder(
            ["laser"], traj_options,
            local_slam_result_callback=lambda *a: results.append(a))
        assert tid == 0
        assert mb.num_trajectory_builders() == 1

        world = make_wall_points(num=400, seed=5)
        poses = square_loop_poses()
        t0 = 1_000_000_000
        for i, (t_xy, yaw) in enumerate(poses):
            scan = scan_at(world, t_xy, yaw)
            mb.add_sensor_data(tid, "laser", TimedPointCloudData(
                time=t0 + from_seconds(i * 0.1),
                origin=np.zeros(3, np.float32),
                ranges=scan,
                times=np.zeros(len(scan), np.float32)))
        mb.finish_trajectory(tid)
        mb.pose_graph.run_final_optimization()

        assert len(results) == len(poses)
        pg = mb.pose_graph
        assert len(pg.nodes) > 30
        assert len(pg.submap_data) >= 3
        # Loop closure must have fired.
        assert pg.num_inter_constraints() > 0

        # Node global poses close to ground truth (everything is consistent
        # in this noise-free world; optimization must not corrupt it). Nodes
        # map to ground-truth poses via their timestamps (the motion filter
        # drops some scans).
        errs = []
        for (tid_, nindex), node in pg.nodes.items():
            gt_index = round((node.time - t0) / 100_000)
            gt_t, _ = poses[gt_index]
            errs.append(np.linalg.norm(node.global_pose_2d[:2] - gt_t))
        errs = np.asarray(errs)
        assert errs.mean() < 0.12, errs.mean()
        assert errs.max() < 0.3, errs.max()

    def test_requires_builder_choice(self):
        with pytest.raises(ValueError):
            MapBuilder(MapBuilderOptions())
