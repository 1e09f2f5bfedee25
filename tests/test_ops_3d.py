"""3D kernel tests: grids, insertion, SE(3) Gauss-Newton, rotational
histogram, BnB, SE(3) SPA (reference: hybrid_grid_test.cc,
range_data_inserter_3d_test.cc, ceres_scan_matcher_3d, rotational_scan_matcher_test.cc,
fast_correlative_scan_matcher_3d_test.cc, optimization_problem_3d_test.cc)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.ops.bnb_3d import (
    FastCorrelativeMatcherParams3D,
    build_precomputation_pyramid_3d,
    fast_correlative_match_3d,
)
from cartographer_tpu.ops.grid_3d import Grid3D, insert_range_data_3d
from cartographer_tpu.ops.rot_histogram import (
    compute_rotational_histogram,
    match_histograms,
    rotate_histogram,
)
from cartographer_tpu.ops.scan_matcher_3d import (
    CorrelativeSearchParams3D,
    GaussNewtonMatcherParams3D,
    gauss_newton_match_3d,
    real_time_correlative_match_3d,
    se3_retract,
)
from cartographer_tpu.ops.spa_3d import (
    SpaProblem3D,
    constraint_residual_3d,
    solve_spa_3d,
)
from cartographer_tpu.transform import Rigid3, quaternion as quat


def make_environment_3d(num=400, seed=0):
    """Points on the walls of a tilted box room 8 x 6 x 3.

    The box is rotated off the grid axes: axis-aligned planes would give
    every wall point the same within-cell fraction, making the interpolated
    occupied-space cost minimum sit a cell-centering bias away from the true
    pose (a property shared with the reference's voxel-center-peaked
    interpolated grids).
    """
    rng = np.random.RandomState(seed)
    pts = []
    for _ in range(num):
        side = rng.randint(5)
        if side == 0:
            pts.append([4.013, rng.uniform(-3, 3), rng.uniform(0, 3)])
        elif side == 1:
            pts.append([-3.987, rng.uniform(-3, 3), rng.uniform(0, 3)])
        elif side == 2:
            pts.append([rng.uniform(-4, 4), 3.013, rng.uniform(0, 3)])
        elif side == 3:
            pts.append([rng.uniform(-4, 4), -2.987, rng.uniform(0, 3)])
        else:
            pts.append([rng.uniform(-4, 4), rng.uniform(-3, 3), 0.013])
    pts = np.asarray(pts, np.float32)
    tilt = np.asarray(quat.to_matrix(
        quat.from_axis_angle(jnp.array([0.15, 0.1, 0.3]))), np.float32)
    return pts @ tilt.T


def build_grid_3d(world, resolution=0.2, size=64, num_inserts=8):
    grid = Grid3D.create(size, resolution, jnp.zeros(3))
    pts = jnp.asarray(world)
    mask = jnp.ones(len(world), bool)
    for _ in range(num_inserts):
        grid = insert_range_data_3d(grid, jnp.zeros(3), pts, mask)
    return grid


class TestGrid3D:
    def test_insert_hits_and_misses(self):
        # Coordinates deliberately off cell boundaries (floor() under float32
        # flips at exact multiples of the resolution).
        grid = Grid3D.create(32, 0.2, jnp.zeros(3))
        pts = jnp.asarray([[2.03, 0.03, 0.03]], jnp.float32)
        grid = insert_range_data_3d(grid, jnp.zeros(3), pts, jnp.ones(1, bool))
        prob = np.asarray(grid.probability())
        hit = np.asarray(grid.world_to_cell(jnp.array([2.03, 0.03, 0.03])))
        assert prob[tuple(hit)] > 0.5
        # Only the last num_free_space_voxels cells before the hit are free.
        near_hit = np.asarray(grid.world_to_cell(jnp.array([1.83, 0.03, 0.03])))
        assert prob[tuple(near_hit)] < 0.5
        # Cells near the origin stay unknown (performance shortcut of the
        # reference inserter).
        near_origin = np.asarray(grid.world_to_cell(jnp.array([0.43, 0.03, 0.03])))
        assert not np.asarray(grid.known)[tuple(near_origin)]

    def test_hit_beats_miss(self):
        grid = Grid3D.create(32, 0.2, jnp.zeros(3))
        # Two collinear rays: far hit's free cells include the near hit cell.
        pts = jnp.asarray([[2.03, 0.03, 0.03], [2.23, 0.03, 0.03]], jnp.float32)
        grid = insert_range_data_3d(grid, jnp.zeros(3), pts, jnp.ones(2, bool))
        prob = np.asarray(grid.probability())
        near = np.asarray(grid.world_to_cell(jnp.array([2.03, 0.03, 0.03])))
        assert prob[tuple(near)] > 0.5


class TestGaussNewton3D:
    def test_recovers_small_offset(self):
        world = make_environment_3d()
        grid = build_grid_3d(world)
        low = build_grid_3d(world, resolution=0.6, size=32)
        pts = jnp.asarray(world)
        mask = jnp.ones(len(world), bool)
        initial = Rigid3(jnp.array([0.08, -0.05, 0.04]),
                         quat.from_axis_angle(jnp.array([0.0, 0.0, 0.03])))
        params = GaussNewtonMatcherParams3D(
            translation_weight=0.1, rotation_weight=1.0, num_iterations=15)
        pose, cost = gauss_newton_match_3d(
            grid, low, pts, mask, pts, mask, initial, params)
        err = np.linalg.norm(np.asarray(pose.translation))
        assert err < 0.05, err
        assert float(quat.get_angle(pose.rotation)) < 0.02

    def test_yaw_only_parameterization(self):
        world = make_environment_3d()
        grid = build_grid_3d(world)
        low = build_grid_3d(world, resolution=0.6, size=32)
        pts = jnp.asarray(world)
        mask = jnp.ones(len(world), bool)
        initial = Rigid3(jnp.array([0.0, 0.0, 0.0]),
                         quat.from_axis_angle(jnp.array([0.05, 0.0, 0.0])))
        params = GaussNewtonMatcherParams3D(only_optimize_yaw=True, num_iterations=5)
        pose, _ = gauss_newton_match_3d(
            grid, low, pts, mask, pts, mask, initial, params)
        # Roll must be untouched by a yaw-only parameterization.
        aa = np.asarray(quat.to_axis_angle(pose.rotation))
        np.testing.assert_allclose(aa[0], 0.05, atol=1e-3)


class TestCorrelative3D:
    def test_recovers_translation(self):
        world = make_environment_3d()
        grid = build_grid_3d(world)
        true_pose = Rigid3(jnp.array([0.4, -0.2, 0.0]), quat.identity())
        scan = true_pose.inverse().apply(jnp.asarray(world))
        params = CorrelativeSearchParams3D(
            linear_search_window=0.6, angular_search_window=0.02,
            max_scan_range=6.0)
        score, pose = real_time_correlative_match_3d(
            grid, scan, jnp.ones(len(world), bool), Rigid3.identity(), params)
        np.testing.assert_allclose(
            np.asarray(pose.translation), [0.4, -0.2, 0.0], atol=0.21)
        assert float(score) > 0.3


class TestRotationalHistogram:
    def scan_lines(self, yaw=0.0):
        """Points along two perpendicular walls, rotated by yaw."""
        rng = np.random.RandomState(0)
        t = np.linspace(-3, 3, 200)
        pts = np.concatenate([
            np.stack([t, np.full_like(t, 2.0), np.zeros_like(t)], -1),
            np.stack([np.full_like(t, 2.0), t, np.zeros_like(t)], -1),
        ])
        c, s = np.cos(yaw), np.sin(yaw)
        rot = pts.copy()
        rot[:, 0] = c * pts[:, 0] - s * pts[:, 1]
        rot[:, 1] = s * pts[:, 0] + c * pts[:, 1]
        return jnp.asarray(rot, jnp.float32)

    def test_histogram_peaks(self):
        h = compute_rotational_histogram(self.scan_lines(), jnp.ones(400, bool), 120)
        h = np.asarray(h)
        assert h.sum() > 0
        # Wall angles 0 and pi/2 -> bins near 0 and 60 dominate.
        top_bins = np.argsort(h)[-6:]
        assert any(b <= 3 or b >= 117 for b in top_bins)
        assert any(55 <= b <= 65 for b in top_bins)

    def test_rotation_invariance_of_match(self):
        h0 = compute_rotational_histogram(self.scan_lines(0.0), jnp.ones(400, bool), 120)
        h1 = compute_rotational_histogram(self.scan_lines(0.3), jnp.ones(400, bool), 120)
        angles = jnp.linspace(-0.6, 0.6, 41)
        scores = np.asarray(match_histograms(h0, h1, angles))
        best = float(angles[np.argmax(scores)])
        assert abs(best - (-0.3)) < 0.08, best
        # Few-peak histograms with fractional-bin shifts cap the cosine
        # similarity below 1 (bin-splitting); 0.6 separates true alignment
        # from the ~0 similarity at wrong angles.
        assert scores.max() > 0.6

    def test_rotate_histogram_roundtrip(self):
        h = jnp.asarray(np.random.RandomState(1).rand(120), jnp.float32)
        # Exact-bin rotation (20 bins): roundtrip is exact; fractional
        # rotations smooth by linear interpolation.
        a = 20 * np.pi / 120
        r = rotate_histogram(rotate_histogram(h, a), -a)
        np.testing.assert_allclose(np.asarray(r), np.asarray(h), atol=1e-5)

    def test_rotate_moves_content_positive(self):
        h = jnp.zeros(120).at[10].set(1.0)
        r = np.asarray(rotate_histogram(h, 5 * np.pi / 120))
        assert r.argmax() == 15


class TestFastCorrelative3D:
    def test_recovers_pose(self):
        world = make_environment_3d(num=300, seed=2)
        grid = build_grid_3d(world, resolution=0.2, size=64)
        low = build_grid_3d(world, resolution=0.6, size=32)
        pyramid = build_precomputation_pyramid_3d(grid.probability(), 4)
        mask = jnp.ones(len(world), bool)
        hist = compute_rotational_histogram(jnp.asarray(world), mask, 60)

        true_pose = Rigid3(jnp.array([0.6, -0.4, 0.1]),
                           quat.from_yaw(jnp.array(0.1)))
        scan = true_pose.inverse().apply(jnp.asarray(world))
        scan_hist = compute_rotational_histogram(scan, mask, 60)
        params = FastCorrelativeMatcherParams3D(
            branch_and_bound_depth=4,
            min_rotational_score=0.5, min_low_resolution_score=0.3,
            linear_xy_search_window=1.5, linear_z_search_window=0.4,
            angular_search_window=math.radians(15.0),
            beam_width=512, max_scan_range=6.0)
        found, score, pose, rot_score, low_score = fast_correlative_match_3d(
            pyramid, grid, low, scan, mask, scan, mask,
            scan_hist, hist, Rigid3.identity(), params, min_score=0.3)
        assert bool(found)
        np.testing.assert_allclose(
            np.asarray(pose.translation), [0.6, -0.4, 0.1], atol=0.25)
        assert abs(float(quat.get_yaw(pose.rotation)) - 0.1) < 0.05

    def test_dense_matches_beam(self):
        """The dense MXU-bounds matcher (TPU production path) must agree
        with the level-synchronous beam matcher (the executable
        specification): both search the same (yaw, x, y, z) tree with
        admissible bounds, so the recovered leaf must coincide."""
        world = make_environment_3d(num=300, seed=4)
        grid = build_grid_3d(world, resolution=0.2, size=64)
        low = build_grid_3d(world, resolution=0.6, size=32)
        pyramid = build_precomputation_pyramid_3d(grid.probability(), 4)
        mask = jnp.ones(len(world), bool)
        hist = compute_rotational_histogram(jnp.asarray(world), mask, 60)
        params = FastCorrelativeMatcherParams3D(
            branch_and_bound_depth=4,
            min_rotational_score=0.5, min_low_resolution_score=0.3,
            linear_xy_search_window=1.5, linear_z_search_window=0.4,
            angular_search_window=math.radians(15.0),
            beam_width=512, max_scan_range=6.0)
        for tx, ty, tz, yaw in [(0.6, -0.4, 0.1, 0.1),
                                (-0.5, 0.7, -0.2, -0.08)]:
            true_pose = Rigid3(jnp.array([tx, ty, tz]),
                               quat.from_yaw(jnp.array(yaw)))
            scan = true_pose.inverse().apply(jnp.asarray(world))
            scan_hist = compute_rotational_histogram(scan, mask, 60)
            outs = {}
            for m in ("beam", "dense"):
                outs[m] = fast_correlative_match_3d(
                    pyramid, grid, low, scan, mask, scan, mask,
                    scan_hist, hist, Rigid3.identity(), params,
                    min_score=0.3, method=m)
            fb, sb, pb = outs["beam"][:3]
            fd, sd, pd = outs["dense"][:3]
            assert bool(fb) and bool(fd)
            np.testing.assert_allclose(np.asarray(pd.translation),
                                       np.asarray(pb.translation), atol=1e-6)
            assert abs(float(sd) - float(sb)) < 1e-5


class TestSpa3D:
    def test_chain_recovers(self):
        rng = np.random.RandomState(0)
        V = 5
        gt_t = np.stack([np.linspace(0, 4, V), np.zeros(V), np.linspace(0, 1, V)], -1)
        gt_q = np.stack([np.asarray(quat.from_yaw(jnp.array(y)))
                         for y in np.linspace(0, 0.5, V)])
        a = np.arange(V - 1, dtype=np.int32)
        b = a + 1
        rel_t, rel_q = [], []
        for i in range(V - 1):
            qa, qb = jnp.asarray(gt_q[i]), jnp.asarray(gt_q[i + 1])
            rel_t.append(np.asarray(quat.rotate(quat.conjugate(qa),
                                                jnp.asarray(gt_t[i + 1] - gt_t[i]))))
            rel_q.append(np.asarray(quat.multiply(quat.conjugate(qa), qb)))
        init_t = gt_t + rng.normal(0, 0.2, gt_t.shape)
        init_t[0] = gt_t[0]
        problem = SpaProblem3D(
            translations=jnp.asarray(init_t, jnp.float32),
            rotations=jnp.asarray(gt_q, jnp.float32),
            a_idx=jnp.asarray(a), b_idx=jnp.asarray(b),
            rel_t=jnp.asarray(np.asarray(rel_t), jnp.float32),
            rel_q=jnp.asarray(np.asarray(rel_q), jnp.float32),
            trans_weight=jnp.full(V - 1, 1e5),
            rot_weight=jnp.full(V - 1, 1e5),
            use_huber=jnp.zeros(V - 1, bool),
            valid=jnp.ones(V - 1, bool),
            fixed=jnp.asarray(np.arange(V) == 0))
        t, q = solve_spa_3d(problem, num_iterations=20)
        np.testing.assert_allclose(np.asarray(t), gt_t, atol=1e-2)

    def test_residual_zero_at_truth(self):
        qa = quat.from_yaw(jnp.array(0.3))
        qb = quat.from_yaw(jnp.array(0.8))
        ta = jnp.array([1.0, 2.0, 0.0])
        tb = jnp.array([2.0, 2.5, 0.3])
        rel_t = quat.rotate(quat.conjugate(qa), tb - ta)
        rel_q = quat.multiply(quat.conjugate(qa), qb)
        r = constraint_residual_3d(ta, qa, tb, qb, rel_t, rel_q, 1.0, 1.0)
        np.testing.assert_allclose(np.asarray(r), 0, atol=1e-6)


class TestPrecomputationStack3D:
    """Mixed-resolution uint8 pyramid (precomputation_grid_3d.cc analog)."""

    def test_memory_within_2x_grid(self):
        from cartographer_tpu.ops.bnb_3d import build_precomputation_stack_3d

        s = 64
        prob = jnp.full((s, s, s), 0.5, jnp.float32)
        stack = build_precomputation_stack_3d(prob, depth=8,
                                              full_resolution_depth=3)
        grid_bytes = s ** 3 * 4  # f32 grid
        stack_bytes = stack.full.size + stack.coarse.size  # uint8
        assert stack_bytes <= 2 * grid_bytes, (stack_bytes, grid_bytes)
        assert stack.full.shape == (3, s, s, s)
        assert stack.coarse.shape == (5, s // 2, s // 2, s // 2)
        assert stack.full.dtype == jnp.uint8
        assert stack.coarse.dtype == jnp.uint8

    def test_upper_bound_property(self):
        # Every level value at (cell+offset)>>re must be >= the level-0 value
        # at any descendant (cell+offset+d), d in [0, 2^h)^3 — BnB bound
        # admissibility across the full/coarse transition.
        from cartographer_tpu.ops.bnb_3d import build_precomputation_stack_3d

        rng = np.random.default_rng(7)
        s = 32
        prob = jnp.asarray(
            0.1 + 0.8 * rng.random((s, s, s)).astype(np.float32))
        depth, frd = 5, 2
        stack = build_precomputation_stack_3d(prob, depth, frd)
        lvl0 = np.asarray(stack.full[0])
        cells = rng.integers(0, s, size=(64, 3))
        for h in range(1, depth):
            if h < frd:
                level = np.asarray(stack.full[h])
                re = 0
            else:
                level = np.asarray(stack.coarse[h - frd])
                re = h - frd + 1
            w = 1 << h
            for c in cells:
                descendants = lvl0[
                    c[0]:min(c[0] + w, s),
                    c[1]:min(c[1] + w, s),
                    c[2]:min(c[2] + w, s)]
                bound = level[c[0] >> re, c[1] >> re, c[2] >> re]
                assert bound >= descendants.max(), (h, c)

    def test_recovers_pose_deep_pyramid(self):
        # Default-config depth 8 / frd 3: coarse levels active, pose recovery
        # must still work (fast_correlative_scan_matcher_3d_test.cc analog).
        from cartographer_tpu.ops.bnb_3d import build_precomputation_stack_3d

        world = make_environment_3d(num=300, seed=3)
        grid = build_grid_3d(world, resolution=0.15, size=64)
        low = build_grid_3d(world, resolution=0.45, size=32)
        stack = build_precomputation_stack_3d(grid.probability(), 8, 3)
        mask = jnp.ones(len(world), bool)
        hist = compute_rotational_histogram(jnp.asarray(world), mask, 60)
        true_pose = Rigid3(jnp.array([0.8, -0.5, 0.15]),
                           quat.from_yaw(jnp.array(-0.08)))
        scan = true_pose.inverse().apply(jnp.asarray(world))
        scan_hist = compute_rotational_histogram(scan, mask, 60)
        params = FastCorrelativeMatcherParams3D(
            branch_and_bound_depth=8, full_resolution_depth=3,
            min_rotational_score=0.5, min_low_resolution_score=0.3,
            linear_xy_search_window=2.0, linear_z_search_window=0.5,
            angular_search_window=math.radians(15.0),
            beam_width=1024, max_scan_range=6.0)
        found, score, pose, rot_score, low_score = fast_correlative_match_3d(
            stack, grid, low, scan, mask, scan, mask,
            scan_hist, hist, Rigid3.identity(), params, min_score=0.25)
        assert bool(found)
        np.testing.assert_allclose(
            np.asarray(pose.translation), [0.8, -0.5, 0.15], atol=0.3)
        assert abs(float(quat.get_yaw(pose.rotation)) + 0.08) < 0.05
