"""Async constraint search mode (reference P2 frontend/backend pipelining):
results must match the synchronous mode's quality on the loop trajectory."""

import numpy as np

from cartographer_tpu.core.config import apply_overrides
from cartographer_tpu.core.time import from_seconds
from cartographer_tpu.mapping.map_builder import MapBuilder
from cartographer_tpu.sensor.data import TimedPointCloudData

from test_local_slam_2d import make_wall_points, scan_at
from test_map_builder import build_options, square_loop_poses


def test_async_matches_sync_quality():
    mb_options, traj_options = build_options()
    mb_options = apply_overrides(mb_options, {
        "async_constraint_search": True,
        "num_background_threads": 2,
        "pose_graph.constraint_builder.sampling_ratio": 1.0,
    })
    mb = MapBuilder(mb_options)
    tid = mb.add_trajectory_builder(["laser"], traj_options)
    world = make_wall_points(num=400, seed=5)
    poses = square_loop_poses()
    t0 = 1_000_000_000
    for i, (t_xy, yaw) in enumerate(poses):
        mb.add_sensor_data(tid, "laser", TimedPointCloudData(
            time=t0 + from_seconds(i * 0.1), origin=np.zeros(3, np.float32),
            ranges=scan_at(world, t_xy, yaw),
            times=np.zeros(len(world), np.float32)))
    mb.finish_trajectory(tid)
    pg = mb.pose_graph
    pg.run_final_optimization()  # waits for pending background searches
    assert not pg._pending_futures
    assert pg.num_inter_constraints() > 0
    errs = []
    for (tt, ni), node in pg.nodes.items():
        gi = round((node.time - t0) / 100_000)
        errs.append(np.linalg.norm(node.global_pose_2d[:2] - poses[gi][0]))
    assert float(np.mean(errs)) < 0.12, np.mean(errs)
