"""Branch-and-bound loop closure matcher tests (reference:
fast_correlative_scan_matcher_2d_test.cc — random-pose recovery)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from cartographer_tpu.ops.bnb_2d import (
    FastCorrelativeMatcherParams2D,
    build_precomputation_pyramid,
    fast_correlative_match_2d,
)
from cartographer_tpu.ops.grid_2d import Grid2D, insert_range_data
from cartographer_tpu.ops.probability import UNKNOWN_PROBABILITY
from cartographer_tpu.sensor import PointCloud
from cartographer_tpu.sensor.point_cloud import RangeData
from cartographer_tpu.transform import Rigid2

from test_scan_matching_2d import build_grid, make_environment


class TestPyramid:
    def test_level0_is_grid(self):
        prob = jnp.asarray(np.random.RandomState(0).uniform(0.1, 0.9, (32, 32)), jnp.float32)
        pyr = build_precomputation_pyramid(prob, depth=4)
        np.testing.assert_allclose(np.asarray(pyr[0]), np.asarray(prob))

    def test_levels_are_window_max(self):
        rng = np.random.RandomState(1)
        prob = rng.uniform(0.1, 0.9, (32, 32)).astype(np.float32)
        pyr = np.asarray(build_precomputation_pyramid(jnp.asarray(prob), depth=4))
        for h in [1, 2, 3]:
            w = 1 << h
            for x in [0, 5, 17]:
                for y in [0, 9, 25]:
                    want = prob[x:x + w, y:y + w].max()
                    assert pyr[h][x, y] >= want - 1e-6
                    # Bound is tight (max over exactly that window, padded with
                    # unknown outside).
                    if x + w <= 32 and y + w <= 32:
                        np.testing.assert_allclose(pyr[h][x, y], want, rtol=1e-6)

    def test_monotone_in_depth(self):
        prob = jnp.asarray(np.random.RandomState(2).uniform(0.1, 0.9, (32, 32)), jnp.float32)
        pyr = np.asarray(build_precomputation_pyramid(prob, depth=5))
        assert np.all(pyr[1:] >= pyr[:-1] - 1e-6)


class TestFastCorrelativeMatch:
    def setup_method(self, method):
        self.world = make_environment(num_points=150, seed=3)
        self.grid = build_grid(self.world, resolution=0.05, size=256)
        self.pyramid = build_precomputation_pyramid(self.grid.probability(), depth=5)
        self.params = FastCorrelativeMatcherParams2D(
            linear_search_window=2.0,
            angular_search_window=math.radians(20.0),
            branch_and_bound_depth=5,
            beam_width=1024,
            max_scan_range=6.0,
        )

    def match(self, scan_pts, initial, min_score=0.5):
        pc = PointCloud.from_numpy(scan_pts, capacity=256)
        return fast_correlative_match_2d(
            self.pyramid, self.grid, pc.points, pc.mask, initial,
            self.params, min_score)

    def test_recovers_large_offset(self):
        # Scan as seen from (1.2, -0.7, 0.15); initial guess is identity.
        true_pose = Rigid2.from_xytheta(1.2, -0.7, 0.15)
        scan = np.asarray(true_pose.inverse().apply(jnp.asarray(self.world)))
        found, score, pose = self.match(scan, Rigid2.identity())
        assert bool(found)
        np.testing.assert_allclose(
            np.asarray(pose.translation), [1.2, -0.7], atol=0.07)
        assert abs(float(pose.rotation) - 0.15) < 0.02
        assert float(score) > 0.6

    def test_no_match_in_empty_region(self):
        # A scan of a distinctive shape not in the map must fall below
        # min_score.
        rng = np.random.RandomState(7)
        t = np.linspace(0, 2 * np.pi, 150)
        scan = np.stack([0.4 * np.cos(t) + 0.03 * rng.randn(150),
                         0.4 * np.sin(t) + 0.03 * rng.randn(150)], -1).astype(np.float32)
        found, score, pose = self.match(scan, Rigid2.identity(), min_score=0.75)
        assert not bool(found)

    def test_multiple_random_poses(self):
        rng = np.random.RandomState(11)
        for _ in range(4):
            x, y = rng.uniform(-1.5, 1.5, 2)
            th = rng.uniform(-0.25, 0.25)
            true_pose = Rigid2.from_xytheta(x, y, th)
            scan = np.asarray(true_pose.inverse().apply(jnp.asarray(self.world)))
            found, score, pose = self.match(scan, Rigid2.identity())
            assert bool(found), (x, y, th)
            err = np.linalg.norm(np.asarray(pose.translation) - [x, y])
            assert err < 0.08, (err, x, y, th)


class TestDenseMatchesBeam:
    """The dense MXU-bounds matcher (TPU production path) must agree with the
    level-synchronous beam matcher (the executable specification) pose-for-
    pose: both search the same (theta, x, y) tree with admissible bounds."""

    def setup_method(self, method):
        self.world = make_environment(num_points=150, seed=3)
        self.grid = build_grid(self.world, resolution=0.05, size=256)
        self.pyramid = build_precomputation_pyramid(self.grid.probability(), depth=5)
        self.params = FastCorrelativeMatcherParams2D(
            linear_search_window=1.5,
            angular_search_window=math.radians(20.0),
            branch_and_bound_depth=5,
            beam_width=2048,
            max_scan_range=6.0,
        )

    def test_pose_and_score_agree(self):
        rng = np.random.RandomState(5)
        for _ in range(3):
            x, y = rng.uniform(-1.0, 1.0, 2)
            th = rng.uniform(-0.2, 0.2)
            true_pose = Rigid2.from_xytheta(x, y, th)
            scan = np.asarray(true_pose.inverse().apply(jnp.asarray(self.world)))
            pc = PointCloud.from_numpy(scan, capacity=256)
            outs = {}
            for m in ("beam", "dense"):
                outs[m] = fast_correlative_match_2d(
                    self.pyramid, self.grid, pc.points, pc.mask,
                    Rigid2.identity(), self.params, 0.5, method=m)
            fb, sb, pb = outs["beam"]
            fd, sd, pd = outs["dense"]
            assert bool(fb) and bool(fd)
            # Identical leaf grid: same best cell and angle index.
            np.testing.assert_allclose(np.asarray(pd.translation),
                                       np.asarray(pb.translation), atol=1e-6)
            assert abs(float(sd) - float(sb)) < 1e-5

    def test_dense_certificate(self):
        true_pose = Rigid2.from_xytheta(0.8, -0.5, 0.1)
        scan = np.asarray(true_pose.inverse().apply(jnp.asarray(self.world)))
        pc = PointCloud.from_numpy(scan, capacity=256)
        found, score, pose, cert = fast_correlative_match_2d(
            self.pyramid, self.grid, pc.points, pc.mask, Rigid2.identity(),
            self.params, 0.5, with_certificate=True, method="dense")
        assert bool(found)
        # On a well-structured map the exact optimum dominates the dropped
        # bounds — the dense search certifies itself.
        assert bool(cert)
