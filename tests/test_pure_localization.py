"""Pure localization end-to-end (reference: map_builder.cc:56-73 — frozen
map from a pbstream + PureLocalizationTrimmer on the new trajectory):
build and save a map, reload it frozen into a fresh MapBuilder, then drive a
NEW robot through the same world and check it localizes into the frozen
map's frame while keeping only the last N of its own submaps."""

import dataclasses
import io as pyio
import math

import numpy as np

from cartographer_tpu.core.config import (
    MapBuilderOptions,
    PureLocalizationTrimmerOptions,
    TrajectoryBuilderOptions,
    apply_overrides,
)
from cartographer_tpu.core.time import from_seconds
from cartographer_tpu.mapping.map_builder import MapBuilder
from cartographer_tpu.sensor.data import TimedPointCloudData

from test_local_slam_2d import make_wall_points, scan_at, small_options


def build_options(num_range_data=6):
    tb2 = small_options(**{
        "submaps.num_range_data": num_range_data,
        "motion_filter.max_distance_meters": 0.01,
    })
    traj = TrajectoryBuilderOptions(trajectory_builder_2d=tb2)
    mb = apply_overrides(
        MapBuilderOptions(use_trajectory_builder_2d=True), {
            "pose_graph.optimize_every_n_nodes": 0,
            "pose_graph.constraint_builder.sampling_ratio": 1.0,
            "pose_graph.global_sampling_ratio": 1.0,
            "pose_graph.constraint_builder.min_score": 0.5,
            "pose_graph.constraint_builder.global_localization_min_score": 0.5,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher.linear_search_window": 3.0,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher.angular_search_window": math.radians(12.0),
            "pose_graph.constraint_builder.fast_correlative_scan_matcher.branch_and_bound_depth": 5,
            "pose_graph.constraint_builder.fast_correlative_scan_matcher.max_scan_range": 12.0,
        })
    return mb, traj


def drive(mb, tid, world, poses, t0):
    for i, (t_xy, yaw) in enumerate(poses):
        mb.add_sensor_data(tid, "laser", TimedPointCloudData(
            time=t0 + from_seconds(i * 0.1), origin=np.zeros(3, np.float32),
            ranges=scan_at(world, t_xy, yaw),
            times=np.zeros(len(world), np.float32)))


def test_pure_localization_on_frozen_map():
    world = make_wall_points(num=400, seed=13)
    mb_opts, traj_opts = build_options()

    # 1. Mapping session.
    mapper = MapBuilder(mb_opts)
    tid = mapper.add_trajectory_builder(["laser"], traj_opts)
    poses_map = [(np.array([0.05 * i, 0.0]), 0.0) for i in range(16)]
    drive(mapper, tid, world, poses_map, t0=1_000_000_000)
    mapper.finish_trajectory(tid)
    buf = pyio.BytesIO()
    mapper.serialize_state(buf)
    buf.seek(0)

    # 2. Localization session: frozen map + pure-localization trimmer.
    localizer = MapBuilder(mb_opts)
    remap = localizer.load_state(buf, load_frozen_state=True)
    assert remap == {0: 0}
    frozen_submaps = len(localizer.pose_graph.submap_data)
    assert frozen_submaps >= 1
    loc_traj_opts = dataclasses.replace(
        traj_opts,
        pure_localization_trimmer=PureLocalizationTrimmerOptions(
            max_submaps_to_keep=2))
    tid2 = localizer.add_trajectory_builder(["laser"], loc_traj_opts)
    assert tid2 == 1

    # The new robot starts at a DIFFERENT world pose; its local frame is
    # anchored at its own start.
    offset = np.array([0.8, 0.4])
    poses_loc = [(offset + np.array([0.05 * i, 0.0]), 0.0) for i in range(20)]
    drive(localizer, tid2, world, poses_loc, t0=5_000_000_000)
    localizer.finish_trajectory(tid2)

    pg = localizer.pose_graph
    # Drain background constraint searches (WaitForAllComputations).
    pg.wait_for_all_computations()
    assert pg.num_inter_constraints() > 0, "robot never localized into the frozen map"
    assert pg.transitively_connected(0, 1)
    pg.run_final_optimization()

    # Frozen map must not move.
    for (tid_, si), entry in pg.submap_data.items():
        if tid_ == 0:
            assert entry.submap.grid is not None
    # Localized trajectory lands at its true world poses (frozen-map frame
    # == world frame here since the mapping run started at the origin).
    errs = []
    for (tid_, ni), node in pg.nodes.items():
        if tid_ != 1:
            continue
        gi = round((node.time - 5_000_000_000) / 100_000)
        errs.append(np.linalg.norm(node.global_pose_2d[:2] - poses_loc[gi][0]))
    assert errs
    assert float(np.mean(errs)) < 0.15, np.mean(errs)
    # Pure-localization trimmer: the new trajectory keeps <= 2 submaps.
    own_submaps = [si for (tid_, si), _ in pg.submap_data.items() if tid_ == 1]
    assert len(own_submaps) <= 2, own_submaps
