"""Tests for 2D grid + insertion (reference: probability_grid_test.cc,
probability_grid_range_data_inserter_2d_test.cc, ray_to_pixel_mask_test.cc)."""

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.ops.grid_2d import Grid2D, insert_range_data
from cartographer_tpu.ops.probability import (
    MAX_PROBABILITY,
    MIN_PROBABILITY,
    UNKNOWN_PROBABILITY,
)
from cartographer_tpu.sensor import PointCloud
from cartographer_tpu.sensor.point_cloud import RangeData


def make_range_data(origin, hits, capacity=64):
    return RangeData(
        origin=jnp.asarray(origin, jnp.float32),
        returns=PointCloud.from_numpy(np.asarray(hits, np.float32), capacity),
        misses=PointCloud.empty(capacity, 2),
    )


class TestGrid2D:
    def test_world_cell_roundtrip(self):
        g = Grid2D.create(64, 0.1, jnp.zeros(2))
        cells = g.world_to_cell(jnp.array([[0.0, 0.0], [1.05, -1.05]]))
        centers = g.cell_center(cells)
        np.testing.assert_allclose(np.asarray(centers)[0], [0.05, 0.05], atol=1e-6)
        # Cell center within half a resolution of the original point.
        np.testing.assert_allclose(np.asarray(centers)[1], [1.05, -1.05], atol=0.05 + 1e-6)

    def test_unknown_probability(self):
        g = Grid2D.create(16, 0.1, jnp.zeros(2))
        np.testing.assert_allclose(float(g.probability()[0, 0]), UNKNOWN_PROBABILITY, rtol=1e-6)


class TestInsertion:
    def test_hit_raises_miss_lowers(self):
        g = Grid2D.create(64, 0.1, jnp.zeros(2))
        rd = make_range_data([0.0, 0.0], [[2.0, 0.0]])
        g = insert_range_data(g, rd, ray_samples=128)
        prob = np.asarray(g.probability())
        hit_cell = np.asarray(g.world_to_cell(jnp.array([2.0, 0.0])))
        mid_cell = np.asarray(g.world_to_cell(jnp.array([1.0, 0.0])))
        assert prob[hit_cell[0], hit_cell[1]] > 0.5
        assert 0 < prob[mid_cell[0], mid_cell[1]] < 0.5
        # Cells off the ray stay unknown.
        off_cell = np.asarray(g.world_to_cell(jnp.array([1.0, 1.0])))
        assert prob[off_cell[0], off_cell[1]] == UNKNOWN_PROBABILITY

    def test_repeated_hits_saturate(self):
        g = Grid2D.create(32, 0.1, jnp.zeros(2))
        rd = make_range_data([0.0, 0.0], [[1.0, 0.0]])
        # logit(0.9)/logit(0.55) ~ 11 hits to saturate; logit(0.1)/logit(0.49)
        # ~ 55 misses — 60 inserts saturates both clamps.
        for _ in range(60):
            g = insert_range_data(g, rd, ray_samples=64)
        prob = np.asarray(g.probability())
        hit_cell = np.asarray(g.world_to_cell(jnp.array([1.0, 0.0])))
        np.testing.assert_allclose(prob[hit_cell[0], hit_cell[1]], MAX_PROBABILITY, atol=1e-4)
        mid_cell = np.asarray(g.world_to_cell(jnp.array([0.5, 0.0])))
        np.testing.assert_allclose(prob[mid_cell[0], mid_cell[1]], MIN_PROBABILITY, atol=1e-4)

    def test_cell_updated_once_per_scan(self):
        # Many duplicate hits in one scan must count as one update.
        g = Grid2D.create(32, 0.1, jnp.zeros(2))
        rd_single = make_range_data([0.0, 0.0], [[1.0, 0.0]])
        rd_multi = make_range_data([0.0, 0.0], [[1.0, 0.0]] * 20)
        g1 = insert_range_data(g, rd_single, ray_samples=64)
        g2 = insert_range_data(g, rd_multi, ray_samples=64)
        np.testing.assert_allclose(
            np.asarray(g1.log_odds), np.asarray(g2.log_odds), atol=1e-6)

    def test_hit_beats_miss(self):
        # A ray passing through another ray's hit cell must not erase the hit.
        g = Grid2D.create(64, 0.1, jnp.zeros(2))
        rd = make_range_data([0.0, 0.0], [[1.0, 0.0], [2.0, 0.0]])
        g = insert_range_data(g, rd, ray_samples=128)
        prob = np.asarray(g.probability())
        near = np.asarray(g.world_to_cell(jnp.array([1.0, 0.0])))
        assert prob[near[0], near[1]] > 0.5

    def test_misses_mark_free(self):
        g = Grid2D.create(64, 0.1, jnp.zeros(2))
        rd = RangeData(
            origin=jnp.zeros(2),
            returns=PointCloud.empty(16, 2),
            misses=PointCloud.from_numpy(np.array([[1.5, 0.0]]), 16),
        )
        g = insert_range_data(g, rd, ray_samples=64)
        prob = np.asarray(g.probability())
        end = np.asarray(g.world_to_cell(jnp.array([1.5, 0.0])))
        assert prob[end[0], end[1]] < 0.5  # endpoint of a miss ray is free

    def test_out_of_bounds_dropped(self):
        g = Grid2D.create(16, 0.1, jnp.zeros(2))  # covers [-0.8, 0.8)
        rd = make_range_data([0.0, 0.0], [[5.0, 0.0]])
        g2 = insert_range_data(g, rd, ray_samples=64)
        # No crash; in-bounds part of the ray marked free.
        prob = np.asarray(g2.probability())
        mid = np.asarray(g2.world_to_cell(jnp.array([0.5, 0.0])))
        assert prob[mid[0], mid[1]] < 0.5

    def test_insert_jittable(self):
        g = Grid2D.create(32, 0.1, jnp.zeros(2))
        rd = make_range_data([0.0, 0.0], [[1.0, 0.0]])
        f = jax.jit(lambda g, rd: insert_range_data(g, rd, ray_samples=64))
        g2 = f(g, rd)
        assert bool(jnp.any(g2.known))

    def test_known_bounds(self):
        g = Grid2D.create(64, 0.1, jnp.zeros(2))
        rd = make_range_data([0.0, 0.0], [[1.0, 0.0]])
        g = insert_range_data(g, rd, ray_samples=64)
        imin, imax, jmin, jmax = g.known_bounds_numpy()
        assert imin <= imax and jmin <= jmax
        assert imax >= 32  # ray extends in +x from center
