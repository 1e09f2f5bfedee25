"""Equivalence tests: MXU (one-hot matmul) kernels vs their gather/scatter
reference implementations. These are the TPU performance-critical paths;
CPU runs both forms and they must agree."""

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.ops.correlative_2d import (
    CorrelativeSearchParams,
    real_time_correlative_match,
)
from cartographer_tpu.ops.grid_2d import Grid2D, insert_range_data
from cartographer_tpu.ops.interp import interp_bicubic
from cartographer_tpu.ops.onehot import (
    count_image,
    interp_bicubic_mm,
    occupancy_mask,
    occupancy_mask_chunked,
)
from cartographer_tpu.ops.scan_matcher_2d import occupied_space_residuals
from cartographer_tpu.sensor import PointCloud
from cartographer_tpu.sensor.point_cloud import RangeData
from cartographer_tpu.transform import Rigid2

from test_scan_matching_2d import build_grid, make_environment


class TestCountImage:
    def test_matches_histogram(self):
        rng = np.random.RandomState(0)
        cells = rng.randint(-5, 40, (500, 2)).astype(np.int32)
        valid = rng.rand(500) > 0.2
        img = np.asarray(count_image(jnp.asarray(cells), jnp.asarray(valid), 32))
        want = np.zeros((32, 32))
        for (x, y), v in zip(cells, valid):
            if v and 0 <= x < 32 and 0 <= y < 32:
                want[x, y] += 1
        np.testing.assert_allclose(img, want)

    def test_occupancy_chunked_equals_direct(self):
        rng = np.random.RandomState(1)
        cells = rng.randint(0, 64, (5000, 2)).astype(np.int32)
        valid = rng.rand(5000) > 0.1
        a = np.asarray(occupancy_mask(jnp.asarray(cells), jnp.asarray(valid), 64))
        b = np.asarray(occupancy_mask_chunked(
            jnp.asarray(cells), jnp.asarray(valid), 64, chunk=512))
        np.testing.assert_array_equal(a, b)


class TestInterpMM:
    def test_matches_gather_bicubic(self):
        rng = np.random.RandomState(2)
        grid = jnp.asarray(rng.uniform(0, 1, (48, 48)), jnp.float32)
        coords = jnp.asarray(rng.uniform(1.5, 46.5, (200, 2)), jnp.float32)
        a = np.asarray(interp_bicubic(grid, coords))
        b = np.asarray(interp_bicubic_mm(grid, coords))
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_border_clamp_matches(self):
        rng = np.random.RandomState(3)
        grid = jnp.asarray(rng.uniform(0, 1, (16, 16)), jnp.float32)
        coords = jnp.asarray([[0.1, 0.1], [15.9, 15.9], [-1.0, 8.0], [8.0, 17.0]],
                             jnp.float32)
        a = np.asarray(interp_bicubic(grid, coords))
        b = np.asarray(interp_bicubic_mm(grid, coords))
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_gradients_match(self):
        rng = np.random.RandomState(4)
        grid = jnp.asarray(rng.uniform(0, 1, (32, 32)), jnp.float32)
        c = jnp.asarray([10.3, 20.7])
        ga = jax.grad(lambda c: interp_bicubic(grid, c[None])[0])(c)
        gb = jax.grad(lambda c: interp_bicubic_mm(grid, c[None])[0])(c)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=2e-4)


class TestCorrelativeMXU:
    def test_matches_gather_method(self):
        world = make_environment(num_points=120, seed=0)
        grid = build_grid(world)
        pc = PointCloud.from_numpy(world, capacity=256)
        params = CorrelativeSearchParams(
            linear_search_window=0.2, angular_search_window=0.1,
            max_scan_range=6.0, angle_chunk=8)
        initial = Rigid2.from_xytheta(0.08, -0.05, 0.02)
        s_g, p_g = real_time_correlative_match(
            grid, pc.points, pc.mask, initial, params, method="gather")
        s_m, p_m = real_time_correlative_match(
            grid, pc.points, pc.mask, initial, params, method="mxu")
        # bf16 count images trade ~1e-3 score precision for half the HBM
        # traffic; match thresholds operate at 0.05 granularity.
        np.testing.assert_allclose(float(s_g), float(s_m), atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(p_g.translation), np.asarray(p_m.translation), atol=1e-6)
        assert abs(float(p_g.rotation) - float(p_m.rotation)) < 1e-6


class TestInsertMXU:
    def test_matches_scatter_method(self):
        world = make_environment(num_points=100, seed=5)
        g0 = Grid2D.create(192, 0.05, jnp.zeros(2))
        rd = RangeData(
            origin=jnp.zeros(2),
            returns=PointCloud.from_numpy(world, capacity=128),
            misses=PointCloud.empty(128, 2))
        g_scatter = insert_range_data(g0, rd, ray_samples=200, method="scatter")
        g_mxu = insert_range_data(g0, rd, ray_samples=200, method="mxu")
        np.testing.assert_array_equal(
            np.asarray(g_scatter.known), np.asarray(g_mxu.known))
        np.testing.assert_allclose(
            np.asarray(g_scatter.log_odds), np.asarray(g_mxu.log_odds), atol=1e-6)


class TestResidualMXU:
    def test_matches_gather_method(self):
        world = make_environment(num_points=150, seed=6)
        grid = build_grid(world)
        pc = PointCloud.from_numpy(world, capacity=256)
        prob = grid.probability()
        pose_vec = jnp.array([0.02, -0.01, 0.005])
        a = np.asarray(occupied_space_residuals(
            prob, grid, pc.points, pc.mask, pose_vec, 1.0, method="gather"))
        b = np.asarray(occupied_space_residuals(
            prob, grid, pc.points, pc.mask, pose_vec, 1.0, method="mxu"))
        # The mxu method quantizes the interpolation operands to bf16
        # (~0.4% of the probability per point, scaled by 1/sqrt(n)).
        np.testing.assert_allclose(a, b, atol=1e-3)
