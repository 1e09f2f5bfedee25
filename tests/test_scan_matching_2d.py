"""Tests for the 2D scan matchers: pose-recovery assertions mirroring
real_time_correlative_scan_matcher_2d_test.cc and ceres_scan_matcher_2d_test.cc."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.ops.correlative_2d import (
    CorrelativeSearchParams,
    real_time_correlative_match,
)
from cartographer_tpu.ops.grid_2d import Grid2D, insert_range_data
from cartographer_tpu.ops.interp import interp_bicubic, interp_trilinear
from cartographer_tpu.ops.scan_matcher_2d import (
    GaussNewtonMatcherParams2D,
    gauss_newton_match_2d,
)
from cartographer_tpu.sensor import PointCloud
from cartographer_tpu.sensor.point_cloud import RangeData
from cartographer_tpu.transform import Rigid2


def make_environment(num_points=120, seed=0):
    """Points on the walls of a room, scan taken from the center.

    Wall coordinates are deliberately NOT multiples of the grid resolution:
    exactly-on-boundary points make floor()-discretization flip between
    neighboring cells under float32 jitter (the reference's rounding
    discretization has the same boundary sensitivity).
    """
    rng = np.random.RandomState(seed)
    pts = []
    for _ in range(num_points):
        side = rng.randint(4)
        if side == 0:
            pts.append([4.013, rng.uniform(-3, 3)])
        elif side == 1:
            pts.append([-3.987, rng.uniform(-3, 3)])
        elif side == 2:
            pts.append([rng.uniform(-4, 4), 3.013])
        else:
            pts.append([rng.uniform(-4, 4), -2.987])
    return np.asarray(pts, np.float32)


def build_grid(world_points, resolution=0.05, size=256, num_inserts=8):
    grid = Grid2D.create(size, resolution, jnp.zeros(2))
    rd = RangeData(
        origin=jnp.zeros(2),
        returns=PointCloud.from_numpy(world_points, capacity=256),
        misses=PointCloud.empty(256, 2),
    )
    for _ in range(num_inserts):
        grid = insert_range_data(grid, rd, ray_samples=256)
    return grid


class TestInterp:
    def test_bicubic_reproduces_linear_ramp(self):
        # Bicubic interpolation is exact for linear functions away from borders.
        g = jnp.arange(16.0)[:, None] * jnp.ones((1, 16))
        coords = jnp.array([[5.5, 7.5], [5.75, 3.2], [8.1, 9.9]])
        vals = interp_bicubic(g, coords)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(coords[:, 0]) - 0.5, atol=1e-4)

    def test_bicubic_differentiable(self):
        g = jnp.arange(16.0)[:, None] * jnp.ones((1, 16))
        grad = jax.grad(lambda c: interp_bicubic(g, c[None, :])[0])(jnp.array([5.5, 7.5]))
        np.testing.assert_allclose(np.asarray(grad), [1.0, 0.0], atol=1e-4)

    def test_trilinear_ramp(self):
        g = jnp.arange(8.0)[:, None, None] * jnp.ones((1, 8, 8))
        coords = jnp.array([[3.5, 4.5, 2.5], [2.25, 3.0, 6.0]])
        vals = interp_trilinear(g, coords)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(coords[:, 0]) - 0.5, atol=1e-5)


class TestCorrelativeMatcher:
    def params(self):
        return CorrelativeSearchParams(
            linear_search_window=0.25,
            angular_search_window=math.radians(8.0),
            max_scan_range=6.0,
        )

    def test_recovers_translation_offset(self):
        world = make_environment()
        grid = build_grid(world)
        scan = PointCloud.from_numpy(world, capacity=256)
        true_pose = Rigid2.from_xytheta(0.0, 0.0, 0.0)
        # Perturb the initial estimate; matcher should snap back.
        initial = Rigid2.from_xytheta(0.12, -0.08, 0.0)
        score, pose = real_time_correlative_match(
            grid, scan.points, scan.mask, initial, self.params())
        np.testing.assert_allclose(np.asarray(pose.translation), [0, 0], atol=0.051)
        assert float(score) > 0.5

    def test_recovers_rotation_offset(self):
        world = make_environment()
        grid = build_grid(world)
        # Scan points as seen from a pose rotated by 0.05 rad.
        true_pose = Rigid2.from_xytheta(0.0, 0.0, 0.05)
        scan_pts = np.asarray(true_pose.inverse().apply(jnp.asarray(world)))
        scan = PointCloud.from_numpy(scan_pts, capacity=256)
        initial = Rigid2.identity()
        score, pose = real_time_correlative_match(
            grid, scan.points, scan.mask, initial, self.params())
        assert abs(float(pose.rotation) - 0.05) < 0.01

    def test_perfect_alignment_scores_high(self):
        world = make_environment()
        grid = build_grid(world)
        scan = PointCloud.from_numpy(world, capacity=256)
        score, pose = real_time_correlative_match(
            grid, scan.points, scan.mask, Rigid2.identity(), self.params())
        assert float(score) > 0.8
        np.testing.assert_allclose(np.asarray(pose.translation), [0, 0], atol=1e-6)


class TestGaussNewtonMatcher:
    def test_refines_subvoxel_offset(self):
        world = make_environment(num_points=200)
        grid = build_grid(world)
        scan = PointCloud.from_numpy(world, capacity=256)
        initial = Rigid2.from_xytheta(0.03, -0.02, 0.01)
        params = GaussNewtonMatcherParams2D(
            occupied_space_weight=1.0, translation_weight=0.1, rotation_weight=0.4)
        pose, cost = gauss_newton_match_2d(
            grid, scan.points, scan.mask, initial, params)
        # Must land closer than the initial error (sub-resolution refinement).
        err = np.linalg.norm(np.asarray(pose.translation))
        assert err < 0.02, err
        assert abs(float(pose.rotation)) < 0.01

    def test_penalties_anchor_pose(self):
        # With overwhelming translation weight the pose must stay at target.
        world = make_environment()
        grid = build_grid(world)
        scan = PointCloud.from_numpy(world, capacity=256)
        initial = Rigid2.from_xytheta(0.1, 0.1, 0.0)
        params = GaussNewtonMatcherParams2D(
            occupied_space_weight=0.0, translation_weight=100.0, rotation_weight=100.0)
        pose, _ = gauss_newton_match_2d(grid, scan.points, scan.mask, initial, params)
        np.testing.assert_allclose(np.asarray(pose.translation), [0.1, 0.1], atol=1e-3)

    def test_jit_and_improves_cost(self):
        world = make_environment()
        grid = build_grid(world)
        scan = PointCloud.from_numpy(world, capacity=256)
        params = GaussNewtonMatcherParams2D()
        f = jax.jit(lambda g, p, m, ip: gauss_newton_match_2d(g, p, m, ip, params))
        pose, cost = f(grid, scan.points, scan.mask, Rigid2.from_xytheta(0.05, 0.0, 0.0))
        assert np.isfinite(float(cost))
        err = np.linalg.norm(np.asarray(pose.translation))
        assert err < 0.05
