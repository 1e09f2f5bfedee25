"""Multi-trajectory mapping: a second robot localizes into the first robot's
map through global constraint search (reference: map_builder_test.cc
multi-trajectory cases + ComputeConstraint's global-search branch)."""

import math

import numpy as np

from cartographer_tpu.core.config import (
    MapBuilderOptions,
    TrajectoryBuilderOptions,
    apply_overrides,
)
from cartographer_tpu.core.time import from_seconds
from cartographer_tpu.mapping.map_builder import MapBuilder
from cartographer_tpu.sensor.data import TimedPointCloudData

from test_local_slam_2d import make_wall_points, scan_at, small_options


def build_mb():
    tb2 = small_options(**{
        "submaps.num_range_data": 6,
        "motion_filter.max_distance_meters": 0.01,
    })
    traj = TrajectoryBuilderOptions(trajectory_builder_2d=tb2)
    mb = apply_overrides(
        MapBuilderOptions(use_trajectory_builder_2d=True), {
            "pose_graph.optimize_every_n_nodes": 0,  # manual optimization
            "pose_graph.constraint_builder.sampling_ratio": 1.0,
            "pose_graph.global_sampling_ratio": 1.0,
            "pose_graph.constraint_builder.min_score": 0.5,
            "pose_graph.constraint_builder.global_localization_min_score": 0.5,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher.linear_search_window": 3.0,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher.angular_search_window": math.radians(12.0),
            "pose_graph.constraint_builder.fast_correlative_scan_matcher.branch_and_bound_depth": 5,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher.max_scan_range": 12.0,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher.beam_width": 2048,
        })
    return MapBuilder(mb), traj


def drive(mb, tid, traj_opts, world, poses, t0):
    for i, (t_xy, yaw) in enumerate(poses):
        scan = scan_at(world, t_xy, yaw)
        mb.add_sensor_data(tid, "laser", TimedPointCloudData(
            time=t0 + from_seconds(i * 0.1), origin=np.zeros(3, np.float32),
            ranges=scan, times=np.zeros(len(scan), np.float32)))


def test_second_trajectory_globally_localizes():
    mb, traj_opts = build_mb()
    world = make_wall_points(num=400, seed=11)

    # Robot A maps a line from the origin.
    tid_a = mb.add_trajectory_builder(["laser"], traj_opts)
    poses_a = [(np.array([0.05 * i, 0.0]), 0.0) for i in range(16)]
    drive(mb, tid_a, traj_opts, world, poses_a, t0=1_000_000_000)
    mb.finish_trajectory(tid_a)

    # Robot B starts elsewhere; its local frame origin is its own start, so
    # its global pose is initially wrong by B's true offset.
    tid_b = mb.add_trajectory_builder(["laser"], traj_opts)
    offset = np.array([1.0, 0.5])
    poses_b = [(offset + np.array([0.05 * i, 0.0]), 0.0) for i in range(16)]
    drive(mb, tid_b, traj_opts, world, poses_b, t0=2_000_000_000)
    mb.finish_trajectory(tid_b)

    pg = mb.pose_graph
    assert pg.num_inter_constraints() > 0, "no global localization happened"
    assert pg.transitively_connected(tid_a, tid_b)
    pg.run_final_optimization()

    # After optimization, B's nodes must sit at their TRUE world positions
    # (B's local origin offset corrected by the inter-trajectory constraints).
    errs = []
    for (tid, ni), node in pg.nodes.items():
        if tid != tid_b:
            continue
        gi = round((node.time - 2_000_000_000) / 100_000)
        errs.append(np.linalg.norm(node.global_pose_2d[:2] - poses_b[gi][0]))
    assert errs, "no nodes for trajectory B"
    assert float(np.mean(errs)) < 0.15, np.mean(errs)


def test_trajectory_connectivity_last_connection_time():
    """trajectory_connectivity_state.cc:26-55: joining two components stamps
    every bipartite pair; recency gates local vs global search."""
    from cartographer_tpu.mapping.connectivity import TrajectoryConnectivityState

    c = TrajectoryConnectivityState()
    for t in range(4):
        c.add(t)
    c.connect(0, 1, 100)
    c.connect(2, 3, 200)
    assert c.transitively_connected(0, 1)
    assert not c.transitively_connected(0, 2)
    assert c.last_connection_time(0, 1) == 100
    assert c.last_connection_time(0, 2) is None
    # joining the two components stamps all bipartite pairs
    c.connect(1, 2, 300)
    for a in (0, 1):
        for b in (2, 3):
            assert c.last_connection_time(a, b) == 300, (a, b)
    # re-connecting an already-connected pair only moves the time forward
    c.connect(0, 1, 50)
    assert c.last_connection_time(0, 1) == 100
    c.connect(0, 1, 400)
    assert c.last_connection_time(0, 1) == 400
    assert sorted(map(tuple, c.components())) == [(0, 1, 2, 3)]
