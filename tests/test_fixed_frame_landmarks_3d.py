"""3D fixed-frame (GPS) + landmark optimization tests.

Reference: optimization_problem_3d.cc:505-578 (fixed-frame constraints with a
learned per-trajectory yaw-only fixed-frame origin, TolerantLoss option) and
landmark_cost_function_3d.h (landmark pose blocks coupled to nodes).
"""

import numpy as np
import jax.numpy as jnp

from cartographer_tpu.core.config import PoseGraphOptions, apply_overrides
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.pose_graph_3d import (
    Constraint3D,
    PoseGraph3D,
    SubmapDataEntry3D,
    TrajectoryNode3D,
)
from cartographer_tpu.mapping.submap_3d import Submap3D
from cartographer_tpu.sensor.data import (
    FixedFramePoseData,
    LandmarkData,
    LandmarkObservation,
)
from cartographer_tpu.transform import nquat

T0 = 1_000_000_000


def _make_graph(n_nodes=8, drift=0.03, opts=None):
    """A single-trajectory chain along +x with INTRA constraints to one
    submap, whose global initial poses drift QUADRATICALLY in +y vs the true
    line (a linear drift on a straight track is gauge-equivalent to a rotated
    fixed-frame origin, so it would rightly NOT be corrected)."""
    pg = PoseGraph3D(opts or PoseGraphOptions())
    submap = Submap3D(
        local_pose_translation=np.zeros(3), local_pose_rotation=nquat.IDENTITY.copy(),
        num_range_data=n_nodes, insertion_finished=True,
        high_grid=None, low_grid=None, histogram=None)
    pg.submap_data.insert(SubmapId(0, 0), SubmapDataEntry3D(
        submap=submap, global_t=np.zeros(3), global_q=nquat.IDENTITY.copy(),
        finished=True))
    truth = []
    for k in range(n_nodes):
        t_true = np.array([0.5 * k, 0.0, 0.0])
        truth.append(t_true)
        t_init = t_true + np.array([0.0, drift * k * k, 0.0])
        node = TrajectoryNode3D(
            time=T0 + k * 1_000_000,
            gravity_alignment=nquat.IDENTITY.copy(),
            high_res_cloud=np.zeros((0, 3)), low_res_cloud=np.zeros((0, 3)),
            scan_histogram=np.zeros(120),
            # Local pose carries the same drift (local SLAM accumulated it).
            local_pose_translation=t_init.copy(),
            local_pose_rotation=nquat.IDENTITY.copy(),
            global_t=t_init.copy(), global_q=nquat.IDENTITY.copy())
        pg.nodes.insert(NodeId(0, k), node)
        # INTRA constraint pinning the node to the (drifting) local chain:
        # weights low enough that GPS evidence can win.
        pg.constraints.append(Constraint3D(
            submap_id=SubmapId(0, 0), node_id=NodeId(0, k),
            rel_t=t_init.copy(), rel_q=nquat.IDENTITY.copy(),
            translation_weight=1e2, rotation_weight=1e2, tag="INTRA_SUBMAP"))
    return pg, np.asarray(truth)


class TestFixedFrame3D:
    def test_gps_corrects_drift_via_learned_origin(self):
        opts = apply_overrides(PoseGraphOptions(), {
            "optimization_problem.fixed_frame_pose_translation_weight": 1e4,
            "optimization_problem.fixed_frame_pose_rotation_weight": 0.0,
            "optimization_problem.local_slam_pose_translation_weight": 1e2,
            "optimization_problem.local_slam_pose_rotation_weight": 1e2,
        })
        pg, truth = _make_graph(opts=opts)
        # GPS fixes in a fixed frame that is the map frame rotated by 30 deg
        # yaw and shifted: the optimizer must learn the origin AND flatten
        # the drift.
        yaw = np.radians(30.0)
        origin_q = nquat.from_yaw(yaw)
        origin_t = np.array([3.0, -2.0, 0.5])
        inv_t, inv_q = nquat.rotate(nquat.conjugate(origin_q), -origin_t), \
            nquat.conjugate(origin_q)
        for k in range(8):
            fix_t = nquat.rotate(inv_q, truth[k]) + inv_t
            pg.add_fixed_frame_pose_data(0, FixedFramePoseData(
                time=T0 + k * 1_000_000, pose_translation=fix_t,
                pose_rotation=None))
        pg.run_optimization(num_iterations=60)
        got = np.stack([pg.nodes[NodeId(0, k)].global_t for k in range(8)])
        # Gauge-free checks (the whole frame may move with the learned
        # origin): (1) each node satisfies its GPS constraint through the
        # learned origin; (2) the quadratic drift (1.47 m at the last node)
        # is gone — the optimized chain is straight again.
        td = pg.trajectory_data[0]
        assert "fixed_frame_origin" in td
        o_t, o_q = td["fixed_frame_origin"]
        for k in range(8):
            fix_t = nquat.rotate(inv_q, truth[k]) + inv_t
            gps_in_map = nquat.rotate(o_q, fix_t) + o_t
            assert np.linalg.norm(got[k] - gps_in_map) < 0.03, k
        second_diff = np.diff(got, n=2, axis=0)
        assert np.abs(second_diff).max() < 0.02, second_diff

    def test_nodes_outside_fix_range_unconstrained(self):
        pg, truth = _make_graph()
        # One fix only: no interpolation interval, and nodes before/after
        # the single timestamp get no constraint except the exact match.
        pg.add_fixed_frame_pose_data(0, FixedFramePoseData(
            time=T0 + 3 * 1_000_000, pose_translation=np.zeros(3),
            pose_rotation=None))
        pg.run_optimization(num_iterations=10)  # must not crash
        assert pg.nodes[NodeId(0, 0)].global_t is not None

    def test_invalid_fix_dropped(self):
        pg, _ = _make_graph()
        pg.add_fixed_frame_pose_data(0, FixedFramePoseData(
            time=T0, pose_translation=None, pose_rotation=None))
        assert not pg._fixed_frame_data.trajectory(0)


class TestLandmarks3D:
    def test_frozen_landmark_anchors_graph(self):
        opts = apply_overrides(PoseGraphOptions(), {
            "optimization_problem.local_slam_pose_translation_weight": 1e2,
            "optimization_problem.local_slam_pose_rotation_weight": 1e2,
        })
        pg, truth = _make_graph(opts=opts)
        # Landmark at a known world pose, observed from every node with the
        # TRUE relative transform; client sets its global pose frozen.
        lm_t = np.array([2.0, 1.5, 0.8])
        lm_q = nquat.from_yaw(0.3)
        pg.set_landmark_pose("beacon", np.concatenate([lm_t, lm_q]),
                             frozen=True)
        for k in range(8):
            node_q = nquat.IDENTITY
            obs_t = nquat.rotate(nquat.conjugate(node_q), lm_t - truth[k])
            pg.add_landmark_data(0, LandmarkData(
                time=T0 + k * 1_000_000,
                landmark_observations=[LandmarkObservation(
                    id="beacon",
                    landmark_to_tracking_transform_translation=obs_t,
                    landmark_to_tracking_transform_rotation=np.asarray(lm_q),
                    translation_weight=1e5, rotation_weight=1e4)]))
        pg.run_optimization(num_iterations=60)
        got = np.stack([pg.nodes[NodeId(0, k)].global_t for k in range(8)])
        # Every node observed the frozen landmark exactly: drift killed.
        err = np.linalg.norm(got - truth, axis=1)
        assert err.max() < 0.05, err
        # The frozen landmark pose itself must not move.
        np.testing.assert_allclose(
            pg.landmark_poses["beacon"][:3], lm_t, atol=1e-9)

    def test_free_landmark_pose_estimated(self):
        pg, truth = _make_graph(drift=0.0)
        lm_t = np.array([1.0, 2.0, 0.3])
        for k in range(8):
            obs_t = lm_t - truth[k]
            pg.add_landmark_data(0, LandmarkData(
                time=T0 + k * 1_000_000,
                landmark_observations=[LandmarkObservation(
                    id="lm1",
                    landmark_to_tracking_transform_translation=obs_t,
                    landmark_to_tracking_transform_rotation=nquat.IDENTITY.copy(),
                    translation_weight=1e4, rotation_weight=1e3)]))
        pg.run_optimization(num_iterations=40)
        assert "lm1" in pg.landmark_poses
        np.testing.assert_allclose(pg.landmark_poses["lm1"][:3], lm_t,
                                   atol=0.02)
        np.testing.assert_allclose(
            nquat.get_yaw(pg.landmark_poses["lm1"][3:7]), 0.0, atol=0.02)

    def test_landmark_poses_serialize_roundtrip(self):
        import io as _io

        from cartographer_tpu.io.pbstream import (
            ProtoStreamReader,
            ProtoStreamWriter,
        )
        from cartographer_tpu.io.serialization import (
            load_state,
            serialize_state,
        )

        pg, truth = _make_graph(drift=0.0)
        pg.set_landmark_pose("beacon", np.concatenate(
            [np.array([1.0, 2, 3]), nquat.from_yaw(0.5)]), frozen=True)
        pg.trajectory_data[0] = {
            "gravity_constant": 9.71,
            "imu_calibration": np.array([1.0, 0, 0, 0]),
            "fixed_frame_origin": (np.array([1.0, -1.0, 0.0]),
                                   nquat.from_yaw(0.2)),
        }
        buf = _io.BytesIO()
        serialize_state(pg, ProtoStreamWriter(buf))
        buf.seek(0)
        pg2 = PoseGraph3D(PoseGraphOptions())
        load_state(ProtoStreamReader(buf), pg2)
        np.testing.assert_allclose(pg2.landmark_poses["beacon"],
                                   pg.landmark_poses["beacon"])
        assert "beacon" in pg2._frozen_landmarks
        td = pg2.trajectory_data[0]
        assert abs(td["gravity_constant"] - 9.71) < 1e-9
        np.testing.assert_allclose(td["fixed_frame_origin"][0],
                                   [1.0, -1.0, 0.0])

    def test_carto_roundtrip_fixed_frame_origin(self):
        import io as _io

        from cartographer_tpu.io.carto_pbstream import (
            load_carto_state,
            write_carto_state,
        )
        from cartographer_tpu.io.pbstream import (
            ProtoStreamReader,
            ProtoStreamWriter,
        )

        pg, _ = _make_graph(drift=0.0)
        pg.trajectory_data[0] = {
            "gravity_constant": 9.75,
            "imu_calibration": np.array([1.0, 0, 0, 0]),
            "fixed_frame_origin": (np.array([0.5, 0.25, 0.0]),
                                   nquat.from_yaw(-0.3)),
        }
        buf = _io.BytesIO()
        write_carto_state(pg, ProtoStreamWriter(buf))
        buf.seek(0)
        pg2 = PoseGraph3D(PoseGraphOptions())
        load_carto_state(ProtoStreamReader(buf), pg2)
        td = pg2.trajectory_data[0]
        np.testing.assert_allclose(td["fixed_frame_origin"][0],
                                   [0.5, 0.25, 0.0], atol=1e-9)
        assert abs(nquat.get_yaw(td["fixed_frame_origin"][1]) + 0.3) < 1e-6
