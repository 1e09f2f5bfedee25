"""3D global localization: MatchFullSubmap + MaybeAddGlobalConstraint +
the PoseGraph3D local-vs-global decision.

Reference: fast_correlative_scan_matcher_3d.cc:147-169 (MatchFullSubmap),
constraint_builder_3d.cc:116-148 (MaybeAddGlobalConstraint),
pose_graph_3d.cc:190-192,285-305 (global samplers + recency gating).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from cartographer_tpu.ops.bnb_3d import (
    FastCorrelativeMatcherParams3D,
    build_precomputation_stack_3d,
    match_full_submap_3d,
    match_full_submap_3d_exact,
)
from cartographer_tpu.ops.grid_3d import Grid3D, insert_range_data_3d
from cartographer_tpu.ops.rot_histogram import compute_rotational_histogram
from cartographer_tpu.transform import quaternion as quat

from test_ops_3d import build_grid_3d, make_environment_3d


PARAMS = FastCorrelativeMatcherParams3D(
    branch_and_bound_depth=4,
    min_rotational_score=0.5, min_low_resolution_score=0.3,
    linear_xy_search_window=1.5, linear_z_search_window=0.4,
    angular_search_window=math.radians(15.0),
    beam_width=1024, max_scan_range=6.0)


class TestMatchFullSubmap3D:
    def _run(self, tx, ty, tz, yaw, method):
        """A scan taken at an arbitrary pose must be recovered with NO
        translation prior and arbitrary yaw prior (the full circle is
        searched) — the kidnapped-robot case a local window can never solve."""
        world = make_environment_3d(num=400, seed=7)
        grid = build_grid_3d(world, resolution=0.2, size=64)
        low = build_grid_3d(world, resolution=0.6, size=32)
        stack = build_precomputation_stack_3d(grid.probability(), 4)
        mask = jnp.ones(len(world), bool)
        submap_hist = compute_rotational_histogram(jnp.asarray(world), mask, 60)

        from cartographer_tpu.transform.rigid import Rigid3
        true_pose = Rigid3(jnp.array([tx, ty, tz]),
                           quat.from_yaw(jnp.array(yaw)))
        scan = true_pose.inverse().apply(jnp.asarray(world))
        scan_hist = compute_rotational_histogram(scan, mask, 60)

        out = match_full_submap_3d(
            stack, grid, low, scan, mask, scan, mask,
            scan_hist, submap_hist,
            quat.identity(), quat.identity(),  # no usable yaw prior
            PARAMS, min_score=0.3, method=method)
        found, score, pose, rot_score, low_score = out
        assert bool(found), f"no match found (score={float(score):.3f})"
        np.testing.assert_allclose(
            np.asarray(pose.translation), [tx, ty, tz], atol=0.3)
        yaw_err = abs(float(quat.get_yaw(pose.rotation)) - yaw)
        yaw_err = min(yaw_err, 2 * math.pi - yaw_err)
        assert yaw_err < 0.08, f"yaw error {yaw_err:.3f}"
        assert float(rot_score) >= PARAMS.min_rotational_score
        assert float(low_score) >= PARAMS.min_low_resolution_score

    def test_recovers_large_yaw_beam(self):
        self._run(1.5, -1.0, 0.2, 2.0, "beam")

    def test_recovers_large_yaw_dense(self):
        self._run(1.5, -1.0, 0.2, 2.0, "dense")

    def test_recovers_negative_yaw(self):
        self._run(-0.8, 1.2, -0.1, -2.6, "beam")

    def test_kidnapped_robot_relocalizes_through_pose_graph(self):
        """A second trajectory with NO pose prior relative to robot 1's map
        acquires its first cross-trajectory constraint through the global
        sampler + full-submap search, and optimization snaps its node onto
        the true pose (reference pose_graph_3d.cc:285-305 +
        constraint_builder_3d.cc:116-148). A purely distance-gated local
        search could never produce this constraint."""
        from cartographer_tpu.core.config import (
            ConstraintBuilderOptions,
            FastCorrelativeScanMatcherOptions3D,
            PoseGraphOptions,
        )
        from cartographer_tpu.mapping.id import NodeId, SubmapId
        from cartographer_tpu.mapping.pose_graph_3d import (
            Constraint3D,
            PoseGraph3D,
            SubmapDataEntry3D,
            TrajectoryNode3D,
        )
        from cartographer_tpu.mapping.submap_3d import Submap3D

        world = make_environment_3d(num=400, seed=7)
        grid = build_grid_3d(world, resolution=0.2, size=64)
        low = build_grid_3d(world, resolution=0.6, size=32)
        mask = jnp.ones(len(world), bool)
        submap_hist = np.asarray(
            compute_rotational_histogram(jnp.asarray(world), mask, 60))

        options = PoseGraphOptions(
            optimize_every_n_nodes=0,  # optimize explicitly below
            global_sampling_ratio=1.0,
            constraint_builder=ConstraintBuilderOptions(
                sampling_ratio=1.0,
                min_score=0.35,
                global_localization_min_score=0.35,
                fast_correlative_scan_matcher_3d=(
                    FastCorrelativeScanMatcherOptions3D(
                        branch_and_bound_depth=4,
                        min_rotational_score=0.5,
                        min_low_resolution_score=0.3,
                        linear_xy_search_window=1.5,
                        linear_z_search_window=0.4))))
        pg = PoseGraph3D(options)

        # Robot 1's map: one finished submap at the map origin with one node.
        submap0 = Submap3D(
            local_pose_translation=np.zeros(3),
            local_pose_rotation=np.array([1.0, 0, 0, 0]),
            num_range_data=10, insertion_finished=True,
            high_grid=grid, low_grid=low, histogram=submap_hist)
        pg.submap_data.insert(SubmapId(0, 0), SubmapDataEntry3D(
            submap=submap0, global_t=np.zeros(3),
            global_q=np.array([1.0, 0, 0, 0]), finished=True))
        pg.nodes.insert(NodeId(0, 0), TrajectoryNode3D(
            time=0, gravity_alignment=np.array([1.0, 0, 0, 0]),
            high_res_cloud=np.asarray(world), low_res_cloud=np.asarray(world),
            scan_histogram=submap_hist,
            local_pose_translation=np.zeros(3),
            local_pose_rotation=np.array([1.0, 0, 0, 0]),
            global_t=np.zeros(3), global_q=np.array([1.0, 0, 0, 0])))
        pg.constraints.append(Constraint3D(
            submap_id=SubmapId(0, 0), node_id=NodeId(0, 0),
            rel_t=np.zeros(3), rel_q=np.array([1.0, 0, 0, 0]),
            translation_weight=1e4, rotation_weight=1e4,
            tag="INTRA_SUBMAP"))

        # Robot 2 wakes up at an unknown pose in robot 1's map.
        from cartographer_tpu.transform.rigid import Rigid3
        true_t = np.array([1.5, -1.0, 0.2])
        true_yaw = 2.0
        true_pose = Rigid3(jnp.asarray(true_t),
                           quat.from_yaw(jnp.array(true_yaw)))
        scan = np.asarray(true_pose.inverse().apply(jnp.asarray(world)))
        scan_hist = np.asarray(compute_rotational_histogram(
            jnp.asarray(scan), mask, 60))

        own_submap = Submap3D(
            local_pose_translation=np.zeros(3),
            local_pose_rotation=np.array([1.0, 0, 0, 0]),
            num_range_data=1, insertion_finished=False)
        node = TrajectoryNode3D(
            # Well past the recency window of any prior connection.
            time=100_000_000, gravity_alignment=np.array([1.0, 0, 0, 0]),
            high_res_cloud=scan, low_res_cloud=scan,
            scan_histogram=scan_hist,
            local_pose_translation=np.zeros(3),
            local_pose_rotation=np.array([1.0, 0, 0, 0]))
        pg.add_node(1, node, [own_submap], [])
        pg.wait_for_all_computations()

        inter = [c for c in pg.constraints
                 if c.tag == "INTER_SUBMAP"
                 and c.node_id.trajectory_id != c.submap_id.trajectory_id]
        assert inter, "no cross-trajectory constraint acquired"
        c = inter[0]
        np.testing.assert_allclose(c.rel_t, true_t, atol=0.3)
        yaw_err = abs(float(quat.get_yaw(jnp.asarray(c.rel_q))) - true_yaw)
        assert min(yaw_err, 2 * math.pi - yaw_err) < 0.1

        pg.run_optimization()
        n = pg.nodes.get(NodeId(1, 0))
        np.testing.assert_allclose(n.global_t, true_t, atol=0.35)
        assert pg.transitively_connected(0, 1)

    def test_exact_wrapper_certifies(self):
        world = make_environment_3d(num=400, seed=9)
        grid = build_grid_3d(world, resolution=0.2, size=64)
        low = build_grid_3d(world, resolution=0.6, size=32)
        stack = build_precomputation_stack_3d(grid.probability(), 4)
        mask = jnp.ones(len(world), bool)
        submap_hist = compute_rotational_histogram(jnp.asarray(world), mask, 60)
        from cartographer_tpu.transform.rigid import Rigid3
        true_pose = Rigid3(jnp.array([0.9, 0.6, 0.1]),
                           quat.from_yaw(jnp.array(1.2)))
        scan = true_pose.inverse().apply(jnp.asarray(world))
        scan_hist = compute_rotational_histogram(scan, mask, 60)
        found, score, pose, rot, lowsc, cert = match_full_submap_3d_exact(
            stack, grid, low, scan, mask, scan, mask,
            scan_hist, submap_hist, quat.identity(), quat.identity(),
            PARAMS, min_score=0.3)
        assert found
        np.testing.assert_allclose(
            np.asarray(pose.translation), [0.9, 0.6, 0.1], atol=0.3)


class TestProductionCapacity3D:
    @pytest.mark.parametrize("seed", [0, 3, 8])
    def test_truncated_clouds_sampled_ground_truth(self, seed):
        """Match quality at the PRODUCTION 3D matcher capacities (VERDICT r4
        weak #7): ConstraintBuilder3D silently truncates filtered clouds at
        _HIGH_CAP/_LOW_CAP; this battery plants a scan at a known snapped
        pose inside the production search window, truncates exactly like the
        production dispatch, and asserts the full-window search reaches the
        ground-truth score — 0 misses. Capacities are PINNED: changing them
        must re-run this battery."""
        from cartographer_tpu.mapping import constraint_builder_3d as cb3
        from cartographer_tpu.transform.rigid import Rigid3

        assert cb3._HIGH_CAP == 256 and cb3._LOW_CAP == 512, \
            "3D matcher capacities changed - re-tune this battery with them"

        rng = np.random.RandomState(100 + seed)
        world = make_environment_3d(num=400, seed=seed)
        grid = build_grid_3d(world, resolution=0.2, size=64)
        low = build_grid_3d(world, resolution=0.6, size=32)
        stack = build_precomputation_stack_3d(grid.probability(), 4)

        # Production-scale window (pose_graph.lua fcsm3d defaults, z capped
        # by the test grid's extent).
        params = FastCorrelativeMatcherParams3D(
            branch_and_bound_depth=4,
            min_rotational_score=0.3, min_low_resolution_score=0.3,
            linear_xy_search_window=5.0, linear_z_search_window=1.0,
            angular_search_window=math.radians(15.0),
            beam_width=4096, max_scan_range=6.0)
        tiny = FastCorrelativeMatcherParams3D(
            branch_and_bound_depth=4,
            min_rotational_score=0.0, min_low_resolution_score=0.0,
            linear_xy_search_window=2 * 0.2, linear_z_search_window=2 * 0.2,
            angular_search_window=1e-4,
            beam_width=4096, max_scan_range=6.0)

        res = 0.2
        dx, dy = np.round(rng.uniform(-2.0, 2.0, 2) / res) * res
        dz = round(rng.uniform(-0.6, 0.6) / res) * res
        true_pose = Rigid3(jnp.array([dx, dy, dz]), quat.identity())
        scan_full = np.asarray(
            true_pose.inverse().apply(jnp.asarray(world)), np.float32)

        # Exactly the production truncation (constraint_builder_3d.py
        # pad_cloud: first cap points kept).
        def pad(c, cap):
            pts = np.zeros((cap, 3), np.float32)
            n = min(len(c), cap)
            pts[:n] = c[:n]
            m = np.zeros(cap, bool)
            m[:n] = True
            return jnp.asarray(pts), jnp.asarray(m)

        hp, hm = pad(scan_full, 256)
        lp, lm = pad(scan_full, 512)
        from cartographer_tpu.ops.rot_histogram import (
            compute_rotational_histogram as crh,
        )
        mask_w = jnp.ones(len(world), bool)
        sub_hist = crh(jnp.asarray(world), mask_w, 60)
        scan_hist = crh(hp, hm, 60)

        from cartographer_tpu.ops.bnb_3d import fast_correlative_match_3d
        _, gt_score, _, _, _ = fast_correlative_match_3d(
            stack, grid, low, hp, hm, lp, lm, scan_hist, sub_hist,
            true_pose, tiny, min_score=0.0)
        found, score, pose, _, _ = fast_correlative_match_3d(
            stack, grid, low, hp, hm, lp, lm, scan_hist, sub_hist,
            Rigid3.identity(), params, min_score=0.2)
        assert bool(found)
        assert float(score) >= float(gt_score) - 0.015, \
            (float(score), float(gt_score))
        np.testing.assert_allclose(
            np.asarray(pose.translation), [dx, dy, dz], atol=0.3)
