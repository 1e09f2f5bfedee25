"""Paged 3D grid: equivalence with the dense grid, long-range reach, and
dense-crop matching support."""

import numpy as np
import jax.numpy as jnp
import pytest

from cartographer_tpu.ops.grid_3d import Grid3D, insert_range_data_3d
from cartographer_tpu.ops.paged_grid_3d import PagedSubmapGrid3D


def make_scan(rng, radius, n=400, center=(0, 0, 0)):
    t = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-0.5, 0.5, n)
    pts = np.stack([radius * np.cos(t) + center[0],
                    radius * np.sin(t) + center[1],
                    z + center[2]], -1).astype(np.float32)
    return pts


class TestPagedGrid3D:
    def test_matches_dense_within_extent(self):
        rng = np.random.RandomState(0)
        pts = make_scan(rng, 4.0)
        mask = np.ones(len(pts), bool)
        origin3 = np.zeros(3, np.float32)

        dense = Grid3D.create(128, 0.1, jnp.zeros(3))
        dense = insert_range_data_3d(dense, jnp.asarray(origin3),
                                     jnp.asarray(pts), jnp.asarray(mask))

        paged = PagedSubmapGrid3D(0.1, np.zeros(3), page_size=16,
                                  max_pages=256, num_blocks=64)
        paged.insert_range_data(origin3, pts, mask)

        # Every dense cell's probability must match through the paged lookup.
        known = np.asarray(dense.known)
        ii, jj, kk = np.nonzero(known)
        centers = (np.stack([ii, jj, kk], -1) + 0.5) * 0.1 + np.asarray(
            dense.origin)
        p_dense = 1 / (1 + np.exp(-np.asarray(dense.log_odds)[ii, jj, kk]))
        p_paged = np.asarray(paged.grid.probability_at(
            jnp.asarray(centers, jnp.float32)))
        np.testing.assert_allclose(p_paged, p_dense, atol=1e-6)
        # Unknown stays unknown.
        far = jnp.asarray([[20.0, 20.0, 0.0]], jnp.float32)
        assert float(paged.grid.probability_at(far)[0]) == 0.5

    def test_long_range_beyond_dense_extent(self):
        """A 90 m ring clips a 25.6 m dense grid; the paged grid stores it."""
        rng = np.random.RandomState(1)
        pts = make_scan(rng, 45.0)  # 90 m diameter
        mask = np.ones(len(pts), bool)
        paged = PagedSubmapGrid3D(0.1, np.zeros(3), page_size=32,
                                  max_pages=1024, num_blocks=64)
        paged.insert_range_data(np.zeros(3, np.float32), pts, mask)
        p = np.asarray(paged.grid.probability_at(jnp.asarray(pts)))
        assert (p > 0.5).mean() > 0.99, "long-range hits not stored"
        # Memory stays proportional to the touched blocks, not the extent.
        assert paged.num_allocated < 400

    def test_crop_dense_feeds_the_matchers(self):
        rng = np.random.RandomState(2)
        pts = make_scan(rng, 30.0, center=(28.0, 0.0, 0.0))
        mask = np.ones(len(pts), bool)
        paged = PagedSubmapGrid3D(0.1, np.zeros(3), page_size=32,
                                  max_pages=1024, num_blocks=64)
        paged.insert_range_data(np.array([28.0, 0, 0], np.float32), pts, mask)

        crop = paged.crop_dense(np.array([58.0, 0.0, 0.0]), 64)
        # Cells near the ring's +x edge (x ~ 58) are inside the crop.
        sel = pts[np.abs(pts[:, 0] - 58.0) < 2.0]
        cells = np.floor((sel - np.asarray(crop.origin)) / 0.1).astype(int)
        ok = np.all((cells >= 0) & (cells < 64), axis=-1)
        assert ok.sum() > 10
        known = np.asarray(crop.known)
        hit = known[cells[ok, 0], cells[ok, 1], cells[ok, 2]]
        assert hit.mean() > 0.99
        p = 1 / (1 + np.exp(-np.asarray(crop.log_odds)))
        assert (p[cells[ok, 0], cells[ok, 1], cells[ok, 2]] > 0.5).all()

    def test_pool_exhaustion_raises(self):
        rng = np.random.RandomState(3)
        paged = PagedSubmapGrid3D(0.1, np.zeros(3), page_size=16,
                                  max_pages=8, num_blocks=64)
        pts = make_scan(rng, 20.0, n=2000)
        with pytest.raises(MemoryError):
            paged.insert_range_data(np.zeros(3, np.float32), pts,
                                    np.ones(len(pts), bool))


class TestLongRangeMatching:
    def test_scan_match_against_crop(self):
        """Long-range pipeline: insert 40 m-radius structure into the paged
        grid, then recover a perturbed pose with the dense GN matcher
        running on a crop — the matcher kernels are unchanged."""
        from cartographer_tpu.ops.scan_matcher_3d import (
            GaussNewtonMatcherParams3D,
            gauss_newton_match_3d,
        )
        from cartographer_tpu.transform.rigid import Rigid3

        rng = np.random.RandomState(5)
        # Structure around (40, 0, 0): a room corner (3 orthogonal planes)
        # fully constrains translation.
        base = np.array([40.0, 0.0, 0.0])
        n = 300
        wall_x = np.stack([np.full(n, 2.013), rng.uniform(-2, 2, n),
                           rng.uniform(-1, 1, n)], -1)
        wall_y = np.stack([rng.uniform(-2, 2, n), np.full(n, 2.013),
                           rng.uniform(-1, 1, n)], -1)
        floor = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                          np.full(n, -1.013)], -1)
        local = np.concatenate([wall_x, wall_y, floor])
        world = (base + local).astype(np.float32)
        mask = np.ones(len(world), bool)

        paged = PagedSubmapGrid3D(0.1, np.zeros(3), page_size=32,
                                  max_pages=1024, num_blocks=64)
        for _ in range(3):
            paged.insert_range_data(base.astype(np.float32), world, mask)

        crop = paged.crop_dense(base, 128)
        # Scan points in the SENSOR frame (rotation acts about the sensor);
        # the true sensor pose is base + true_shift, the initial estimate is
        # base. GN refinement basin is ~1-2 cells of the 0.1 m grid.
        true_shift = np.array([0.08, -0.06, 0.05], np.float32)
        scan_local = (local - true_shift).astype(np.float32)
        refined, cost = gauss_newton_match_3d(
            crop, crop, jnp.asarray(scan_local), jnp.asarray(mask),
            jnp.asarray(scan_local[:256]), jnp.asarray(mask[:256]),
            Rigid3(jnp.asarray(base, jnp.float32),
                   jnp.asarray([1.0, 0, 0, 0])),
            GaussNewtonMatcherParams3D(translation_weight=0.01,
                                       rotation_weight=10.0))
        est = np.asarray(refined.translation)
        np.testing.assert_allclose(est, base + true_shift, atol=0.04)
