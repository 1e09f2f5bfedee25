"""End-to-end 2D local SLAM with grid_type = TSDF (reference parameterizes
its client-server and local-slam tests over PROBABILITY_GRID vs TSDF)."""

import numpy as np

from cartographer_tpu.mapping.local_trajectory_builder_2d import (
    LocalTrajectoryBuilder2D,
)

from test_local_slam_2d import drive_trajectory, make_wall_points, small_options


def test_straight_line_tsdf():
    world = make_wall_points()
    opts = small_options(**{
        "submaps.grid_type": "TSDF",
        "use_online_correlative_scan_matching": True,
    })
    builder = LocalTrajectoryBuilder2D(opts, ["laser"])
    poses = [(np.array([0.05 * i, 0.0]), 0.0) for i in range(20)]
    results = drive_trajectory(builder, world, poses)
    assert len(results) == 20
    final = results[-1].local_pose_translation
    expected = np.array([0.05 * 19, 0.0, 0.0])
    err = np.linalg.norm(final - expected)
    assert err < 0.12, (final, expected)
    # The TSDF submap actually filled in.
    from cartographer_tpu.ops.tsdf_2d import TsdfGrid2D
    grids = builder._active_submaps.matching_grid
    assert isinstance(grids, TsdfGrid2D)
    assert float(np.asarray(grids.weight).max()) > 0
