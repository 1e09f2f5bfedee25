"""Multi-chip sharding tests on the 8-device virtual CPU mesh:
sharded loop-closure matching and distributed SPA (SURVEY.md §2.10)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.ops.bnb_2d import (
    FastCorrelativeMatcherParams2D,
    build_precomputation_pyramid,
)
from cartographer_tpu.ops.grid_2d import Grid2D, insert_range_data
from cartographer_tpu.ops.spa import SpaProblem2D, solve_spa_2d
from cartographer_tpu.parallel import (
    make_mesh,
    sharded_match_pairs,
    solve_spa_2d_sharded,
)
from cartographer_tpu.sensor import PointCloud
from cartographer_tpu.sensor.point_cloud import RangeData
from cartographer_tpu.transform import Rigid2

from test_scan_matching_2d import build_grid, make_environment
from test_spa import build_problem, rel_pose


class TestShardedMatching:
    def test_matches_across_mesh(self):
        assert len(jax.devices()) == 8
        mesh = make_mesh(8)
        world = make_environment(num_points=100, seed=3)
        grid = build_grid(world, resolution=0.05, size=192, num_inserts=8)
        depth = 4
        pyramid = build_precomputation_pyramid(grid.probability(), depth)

        B = 8  # one pair per device
        true_offsets = [(0.3 * (i % 3) - 0.3, 0.2 * (i % 2), 0.0) for i in range(B)]
        points = []
        for off in true_offsets:
            pose = Rigid2.from_xytheta(*off)
            pts = np.asarray(pose.inverse().apply(jnp.asarray(world)))
            points.append(pts)
        points = np.asarray(points, np.float32)
        masks = np.ones((B, 100), bool)
        init = np.zeros((B, 3), np.float32)
        params = FastCorrelativeMatcherParams2D(
            linear_search_window=1.0, angular_search_window=math.radians(10.0),
            branch_and_bound_depth=depth, beam_width=256, max_scan_range=6.0)

        pyramids = jnp.broadcast_to(pyramid, (B,) + pyramid.shape)
        origins = jnp.broadcast_to(grid.origin, (B, 2))
        with mesh:
            found, scores, poses = sharded_match_pairs(
                mesh, pyramids, origins, grid.resolution,
                jnp.asarray(points), jnp.asarray(masks), jnp.asarray(init),
                params, min_score=0.4)
        found = np.asarray(found)
        poses = np.asarray(poses)
        assert found.all()
        for i, off in enumerate(true_offsets):
            np.testing.assert_allclose(poses[i][:2], off[:2], atol=0.08)


class TestDistributedSpa:
    def test_matches_single_chip_solution(self):
        mesh = make_mesh(8)
        rng = np.random.RandomState(0)
        gt = np.stack([np.linspace(0, 5, 6), 0.3 * np.sin(np.linspace(0, 2, 6)),
                       np.linspace(0, 0.8, 6)], -1)
        constraints = [
            (i, i + 1, rel_pose(gt[i], gt[i + 1]), 30.0, 30.0, False)
            for i in range(5)]
        init = gt + rng.normal(0, 0.3, gt.shape)
        init[0] = gt[0]
        problem = build_problem(init, constraints, fixed_slots=[0], max_c=64)

        single = np.asarray(solve_spa_2d(problem, num_iterations=15))
        with mesh:
            multi = np.asarray(solve_spa_2d_sharded(mesh, problem, num_iterations=15))
        np.testing.assert_allclose(multi, single, atol=1e-3)
        np.testing.assert_allclose(multi, gt, atol=1e-3)


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__

        fn, args = __graft_entry__.entry()
        out = jax.jit(fn)(*args)
        pose_vec = np.asarray(out[0])
        assert np.all(np.isfinite(pose_vec))

    def test_dryrun_multichip(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)
