"""TSDF 2D tests (reference: tsdf_2d_test.cc,
tsdf_range_data_inserter_2d_test.cc, normal_estimation_2d_test.cc)."""

import jax.numpy as jnp
import numpy as np

from cartographer_tpu.ops.gauss_newton import lm_solve
from cartographer_tpu.ops.tsdf_2d import (
    TsdfGrid2D,
    estimate_normals_2d,
    insert_range_data_tsdf,
    tsdf_residuals,
)
from cartographer_tpu.sensor import PointCloud
from cartographer_tpu.sensor.point_cloud import RangeData


def wall_scan(n=60, x=2.013):
    """Vertical wall seen from the origin."""
    ys = np.linspace(-1.5, 1.5, n)
    return np.stack([np.full(n, x), ys], -1).astype(np.float32)


def make_rd(pts, capacity=128):
    return RangeData(origin=jnp.zeros(2),
                     returns=PointCloud.from_numpy(pts, capacity),
                     misses=PointCloud.empty(capacity, 2))


class TestNormals:
    def test_wall_normals_face_origin(self):
        pts = jnp.asarray(wall_scan())
        mask = jnp.ones(60, bool)
        normals = np.asarray(estimate_normals_2d(pts, mask, jnp.zeros(2)))
        # Wall at +x: normals point in -x (toward the sensor).
        assert np.all(normals[5:-5, 0] < -0.9)


class TestTsdfInsertion:
    def test_signed_distance_profile(self):
        grid = TsdfGrid2D.create(128, 0.05, jnp.zeros(2), truncation_distance=0.3)
        rd = make_rd(wall_scan())
        grid = insert_range_data_tsdf(grid, rd)
        tsd = np.asarray(grid.tsd)
        weight = np.asarray(grid.weight)

        def cell(x, y):
            return tuple(np.floor((np.array([x, y]) - np.asarray(grid.origin)) / 0.05).astype(int))

        # At the surface: |tsd| small.
        assert abs(tsd[cell(2.013, 0.0)]) < 0.07
        # In front of the wall (toward sensor): positive distance.
        assert tsd[cell(1.85, 0.0)] > 0.05
        # Behind the wall: negative.
        assert tsd[cell(2.18, 0.0)] < -0.05
        # Far away: unknown (zero weight).
        assert weight[cell(0.5, 0.0)] == 0

    def test_weight_saturates(self):
        grid = TsdfGrid2D.create(64, 0.05, jnp.zeros(2), max_weight=10.0)
        rd = make_rd(wall_scan(x=1.013))
        for _ in range(30):
            grid = insert_range_data_tsdf(grid, rd)
        assert float(np.asarray(grid.weight).max()) <= 10.0 + 1e-6

    def test_correspondence_score_peaks_at_surface(self):
        grid = TsdfGrid2D.create(128, 0.05, jnp.zeros(2))
        grid = insert_range_data_tsdf(grid, make_rd(wall_scan()))
        score = np.asarray(grid.correspondence_score())
        surf = tuple(np.floor((np.array([2.013, 0.0]) - np.asarray(grid.origin)) / 0.05).astype(int))
        off = tuple(np.floor((np.array([1.86, 0.0]) - np.asarray(grid.origin)) / 0.05).astype(int))
        assert score[surf] > score[off]
        assert score[surf] > 0.7


class TestTsdfMatching:
    def test_gauss_newton_refines_on_tsdf(self):
        grid = TsdfGrid2D.create(128, 0.05, jnp.zeros(2))
        # Two perpendicular walls constrain x and y.
        pts = np.concatenate([wall_scan(), np.stack(
            [np.linspace(-1.5, 1.5, 60), np.full(60, 2.013)], -1)]).astype(np.float32)
        rd = make_rd(pts, capacity=256)
        for _ in range(3):
            grid = insert_range_data_tsdf(grid, rd)
        cloud = PointCloud.from_numpy(pts, 256)
        initial = jnp.array([0.04, -0.03, 0.0])

        def residual_fn(pose_vec):
            return tsdf_residuals(grid, cloud.points, cloud.mask, pose_vec, 1.0)

        pose, cost, _ = lm_solve(residual_fn, initial, num_iterations=15)
        err = np.linalg.norm(np.asarray(pose)[:2])
        assert err < 0.02, np.asarray(pose)
