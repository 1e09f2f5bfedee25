"""Cross-robot batched serving (mapping/scan_batcher.py): concurrent
trajectories' fused steps coalesce into one vmapped device program; the
per-robot results must match the unbatched serving path."""

import threading

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
from cartographer_tpu.mapping.scan_batcher import ScanBatcher
from cartographer_tpu.sensor.data import TimedPointCloudData

from test_local_slam_2d import make_wall_points, scan_at, small_options


def drive(builder, world, offsets, n_scans=8):
    poses = []
    t0 = 1_000_000_000
    for i in range(n_scans):
        r = builder.add_range_data("laser", TimedPointCloudData(
            time=t0 + from_seconds(i * 0.1), origin=np.zeros(3, np.float32),
            ranges=scan_at(world, offsets + np.array([0.05 * i, 0.0]), 0.0),
            times=np.zeros(len(world), np.float32)))
        if r is not None:
            poses.append(np.asarray(r.local_pose_translation))
    return poses


def test_batched_matches_unbatched():
    world = make_wall_points(num=300, seed=3)
    opts = small_options(**{"motion_filter.max_distance_meters": 0.01})
    starts = [np.array([0.0, 0.0]), np.array([0.3, -0.2])]

    # Reference run: unbatched serving.
    expected = [drive(LocalTrajectoryBuilder2D(opts, ["laser"]), world, s)
                for s in starts]

    # Batched run: two robot threads sharing one ScanBatcher.
    batcher = ScanBatcher(max_batch=2, max_wait_s=0.5)
    builders = [LocalTrajectoryBuilder2D(opts, ["laser"], batcher=batcher)
                for _ in starts]
    results = [None, None]

    def run(k):
        results[k] = drive(builders[k], world, starts[k])

    threads = [threading.Thread(target=run, args=(k,))
               for k in range(len(starts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    batcher.close()

    assert batcher.num_scans == sum(len(e) for e in expected)
    # Real coalescing happened: fewer device programs than scans.
    assert batcher.num_batches < batcher.num_scans
    for exp, got in zip(expected, results):
        assert len(exp) == len(got)
        for e, g in zip(exp, got):
            # vmapped and single programs compile differently; poses agree
            # to float tolerance.
            np.testing.assert_allclose(g, e, atol=2e-3)


def test_single_robot_through_batcher():
    world = make_wall_points(num=300, seed=5)
    opts = small_options(**{"motion_filter.max_distance_meters": 0.01})
    batcher = ScanBatcher(max_batch=4, max_wait_s=0.001)
    b = LocalTrajectoryBuilder2D(opts, ["laser"], batcher=batcher)
    poses = drive(b, world, np.zeros(2), n_scans=5)
    batcher.close()
    assert len(poses) == 5
    np.testing.assert_allclose(poses[-1][:2], [0.05 * 4, 0.0], atol=0.08)


def test_mismatched_options_rejected():
    world = make_wall_points(num=300, seed=5)
    batcher = ScanBatcher(max_batch=2, max_wait_s=0.001)
    a = LocalTrajectoryBuilder2D(
        small_options(**{"motion_filter.max_distance_meters": 0.01}),
        ["laser"], batcher=batcher)
    b = LocalTrajectoryBuilder2D(
        small_options(**{"motion_filter.max_distance_meters": 0.5}),
        ["laser"], batcher=batcher)
    drive(a, world, np.zeros(2), n_scans=1)
    with pytest.raises(ValueError, match="different"):
        drive(b, world, np.zeros(2), n_scans=1)
    batcher.close()
