"""Intensity grids in the live 3D pipeline.

Reference: IntensityHybridGrid per active submap's high-resolution grid
(mapping/3d/hybrid_grid.h:547-576), filled by RangeDataInserter3D
(range_data_inserter_3d.cc:76-88, intensity <= threshold only) and consumed
by the frontend matcher's intensity residual
(local_trajectory_builder_3d.cc:489-500, intensity_cost_function_3d.cc).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from cartographer_tpu.ops.grid_3d import (
    Grid3D,
    IntensityGrid3D,
    insert_intensities,
    insert_range_data_3d,
)
from cartographer_tpu.ops.paged_grid_3d import (
    PagedIntensitySubmapGrid3D,
    PagedSubmapGrid3D,
)
from cartographer_tpu.ops.scan_matcher_3d import (
    GaussNewtonMatcherParams3D,
    gauss_newton_match_3d,
)
from cartographer_tpu.transform.rigid import Rigid3


def test_paged_intensity_matches_dense():
    """The paged intensity pool's dense crop equals the dense
    insert_intensities result over the same window."""
    rng = np.random.RandomState(0)
    pts = (rng.rand(400, 3).astype(np.float32) - 0.5) * 6.0
    intens = (rng.rand(400) * 60.0).astype(np.float32)
    mask = rng.rand(400) > 0.1
    threshold = 40.0

    paged = PagedIntensitySubmapGrid3D(0.1, np.zeros(3, np.float32),
                                       page_size=16, max_pages=128,
                                       num_blocks=32)
    dense = IntensityGrid3D.create(96, 0.1, np.zeros(3))
    paged.insert(pts, intens, mask, threshold)
    paged.insert(pts + 0.05, intens, mask, threshold)
    dense = insert_intensities(dense, jnp.asarray(pts), jnp.asarray(intens),
                               jnp.asarray(mask), threshold)
    dense = insert_intensities(dense, jnp.asarray(pts + 0.05),
                               jnp.asarray(intens), jnp.asarray(mask),
                               threshold)

    crop = paged.crop_dense(np.zeros(3, np.float32), 96)
    # The two grids share origin/resolution by construction.
    np.testing.assert_allclose(np.asarray(crop.origin),
                               np.asarray(dense.origin), atol=1e-5)
    np.testing.assert_allclose(np.asarray(crop.sums), np.asarray(dense.sums),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(crop.counts),
                               np.asarray(dense.counts), atol=1e-5)
    # Threshold respected: no contribution from intensity > threshold points.
    assert float(jnp.max(crop.counts)) > 0


def _corridor_world(rng, n=6000, span=7.0):
    """Two walls (y = +-2), uniform along x: geometry that cannot pin the
    along-corridor translation. Wall intensity varies with x. Points are
    RANDOMLY placed so the inserted occupancy has no sampling comb along x
    (a regular grid of hits would itself act as an x-texture)."""
    x = (rng.rand(n) - 0.5) * 2 * span
    z = 0.2 + rng.rand(n) * 1.8
    y = np.where(rng.rand(n) > 0.5, 2.0, -2.0)
    world = np.stack([x, y, z], -1).astype(np.float32)
    # Intensity texture along the corridor (period 2 m), below threshold.
    intens = (15.0 + 12.0 * np.sin(world[:, 0] * np.pi)).astype(np.float32)
    return world, intens


@pytest.mark.parametrize("use_intensity", [False, True])
def test_intensity_residual_pins_corridor_translation(use_intensity):
    """In a geometrically ambiguous corridor the occupancy residual cannot
    recover an along-corridor offset; the intensity residual can — the
    measurable-improvement criterion for intensity_cost_function_3d."""
    rng = np.random.RandomState(1)
    res = 0.1

    grid = Grid3D.create(160, res, np.zeros(3))
    igrid = IntensityGrid3D.create(160, res, np.zeros(3))
    # Saturate the wall voxels with several INDEPENDENT draws so occupancy
    # carries no sampling texture along x.
    for k in range(5):
        world, intens = _corridor_world(rng)
        origin = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
        grid = insert_range_data_3d(grid, origin, jnp.asarray(world),
                                    jnp.ones(len(world), bool))
        igrid = insert_intensities(igrid, jnp.asarray(world),
                                   jnp.asarray(intens),
                                   jnp.ones(len(world), bool), 40.0)

    # Scan: an independent draw, taken at true pose x = +0.5; initial
    # estimate identity.
    world, intens = _corridor_world(rng, n=2000, span=5.0)
    true_t = np.array([0.5, 0.0, 0.0], np.float32)
    scan = world - true_t[None, :]
    params = GaussNewtonMatcherParams3D(
        occupied_space_weight_0=1.0, occupied_space_weight_1=0.0,
        intensity_weight=(0.5 if use_intensity else 0.0),
        translation_weight=0.0, rotation_weight=10.0, num_iterations=30)
    pose, _ = gauss_newton_match_3d(
        grid, grid, jnp.asarray(scan), jnp.ones(len(scan), bool),
        jnp.asarray(scan[:1]), jnp.zeros(1, bool),
        Rigid3(jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0])), params,
        intensity_grid=(igrid if use_intensity else None),
        high_intensities=jnp.asarray(intens))
    err_x = abs(float(pose.translation[0]) - 0.5)
    if use_intensity:
        assert err_x < 0.12, f"intensity should pin x, err={err_x}"
    else:
        # Occupancy alone leaves the corridor direction unobservable.
        assert err_x > 0.25, f"corridor should be ambiguous, err={err_x}"


def test_frontend_intensity_e2e_and_serialization(tmp_path):
    """LocalTrajectoryBuilder3D with use_intensities=True: active submaps
    grow intensity pools, the matcher consumes the crop, and the native
    serialization round-trips the intensity grid."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_local_slam_3d import drive_3d, small_options_3d
    from cartographer_tpu.mapping.local_trajectory_builder_3d import (
        LocalTrajectoryBuilder3D)
    from cartographer_tpu.sensor.data import ImuData, TimedPointCloudData
    from cartographer_tpu.core.time import from_seconds

    world, intens = _corridor_world(np.random.RandomState(2))
    opts = small_options_3d(**{
        "use_intensities": True,
        "submaps.num_range_data": 4,
        "ceres_scan_matcher.intensity_cost_function_options_0.weight": 0.5,
    })
    builder = LocalTrajectoryBuilder3D(opts, ["points"])
    t0 = 1_000_000_000
    for k in range(5):
        builder.add_imu_data(ImuData(
            time=t0 - from_seconds(0.05 * (5 - k)),
            linear_acceleration=np.array([0.0, 0.0, 9.81]),
            angular_velocity=np.zeros(3)))
    results = []
    for i in range(10):
        pose_t = np.array([0.1 * i, 0.0, 1.0], np.float32)
        scan = (world - pose_t[None, :]).astype(np.float32)
        t = t0 + from_seconds(i * 0.1)
        r = builder.add_range_data("points", TimedPointCloudData(
            time=t, origin=np.zeros(3, np.float32), ranges=scan,
            times=np.zeros(len(scan), np.float32), intensities=intens))
        if r is not None:
            results.append(r)
        for k in range(1, 5):
            builder.add_imu_data(ImuData(
                time=t + from_seconds(0.1 * k / 5),
                linear_acceleration=np.array([0.0, 0.0, 9.81]),
                angular_velocity=np.zeros(3)))
    assert results, "frontend produced no matches"
    # Pose error stays bounded along the textured corridor.
    # The builder's local frame starts at identity (the first scan defines
    # it), so the expected translation is the relative motion only.
    last = results[-1]
    err = np.linalg.norm(np.asarray(last.local_pose_translation)
                         - np.array([0.1 * 9, 0.0, 0.0]))
    assert err < 0.25, err

    finished = builder.finish()
    assert finished, "no finished submap"
    sm = finished[0]
    assert sm.intensity_paged is not None
    assert sm.intensity_paged.num_allocated > 0
    crop = sm.intensity_grid
    assert crop is not None
    assert float(jnp.sum(crop.counts)) > 0

    # Native serialization round-trip of the intensity grid.
    from cartographer_tpu.io.serialization import (
        _intensity3d_record, _un_intensity3d)
    rec = _intensity3d_record(crop)
    back = _un_intensity3d(rec)
    np.testing.assert_allclose(np.asarray(back.sums), np.asarray(crop.sums),
                               rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(np.asarray(back.counts),
                               np.asarray(crop.counts), atol=0)
    np.testing.assert_allclose(np.asarray(back.origin),
                               np.asarray(crop.origin), atol=1e-6)
