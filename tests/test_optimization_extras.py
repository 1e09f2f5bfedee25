"""Optimization-problem extras: odometry, fixed-frame (GPS), landmarks
(reference: optimization_problem_2d.cc:304-389, landmark_cost_function_2d)."""

import numpy as np

from cartographer_tpu.core.config import PoseGraphOptions, apply_overrides
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.sensor.data import (
    FixedFramePoseData,
    LandmarkData,
    LandmarkObservation,
    OdometryData,
)
from cartographer_tpu.transform import nquat

from test_aux_components import make_graph_with_submaps


def test_odometry_constraints_pull_nodes():
    pg = make_graph_with_submaps(num_submaps=1, nodes_per_submap=4)
    opts = apply_overrides(PoseGraphOptions(), {
        "optimization_problem.local_slam_pose_translation_weight": 1.0,
        "optimization_problem.local_slam_pose_rotation_weight": 1.0,
        "optimization_problem.odometry_translation_weight": 1e6,
        "optimization_problem.odometry_rotation_weight": 1e6,
    })
    pg._options = opts
    # Weak intra constraints so odometry dominates.
    for c in pg.constraints:
        c.translation_weight = 0.01
        c.rotation_weight = 0.01
    # Odometry says consecutive nodes are 1 m apart in x (local poses say 0).
    for k, t in enumerate([0, 1000, 2000, 3000, 4000]):
        pg.add_odometry_data(0, OdometryData(
            time=t, pose_translation=np.array([k * 1.0, 0.0, 0.0]),
            pose_rotation=np.array([1.0, 0, 0, 0])))
    pg.run_optimization(num_iterations=30)
    n0 = pg.nodes[NodeId(0, 0)].global_pose_2d
    n3 = pg.nodes[NodeId(0, 3)].global_pose_2d
    assert abs((n3[0] - n0[0]) - 3.0) < 0.05, (n0, n3)


def test_fixed_frame_learned_origin_corrects_relative_shape():
    """Reference semantics (optimization_problem_2d.cc:351-394): the fixed
    frame couples to the map through a LEARNED origin pose, so a constant
    frame offset is gauge (absorbed by the origin) while the RELATIVE shape
    of the GPS track constrains the nodes."""
    pg = make_graph_with_submaps(num_submaps=1, nodes_per_submap=4)
    opts = apply_overrides(PoseGraphOptions(), {
        "optimization_problem.fixed_frame_pose_translation_weight": 1e6,
        "optimization_problem.fixed_frame_pose_rotation_weight": 0.0,
        "optimization_problem.local_slam_pose_translation_weight": 1.0,
        "optimization_problem.local_slam_pose_rotation_weight": 1.0,
    })
    pg._options = opts
    for c in pg.constraints:
        c.translation_weight = 0.01
        c.rotation_weight = 0.01
    # GPS (in a frame shifted by +10 y): consecutive nodes 1 m apart in x.
    for k, t in enumerate([0, 1000, 2000, 3000]):
        pg.add_fixed_frame_pose_data(0, FixedFramePoseData(
            time=t, pose_translation=np.array([1.0 * k, 10.0, 0.0]),
            pose_rotation=None))
    pg.run_optimization(num_iterations=40)
    n0 = pg.nodes[NodeId(0, 0)].global_pose_2d
    n3 = pg.nodes[NodeId(0, 3)].global_pose_2d
    # Relative GPS shape imposed on the nodes...
    assert abs((n3[0] - n0[0]) - 3.0) < 0.05, (n0, n3)
    # ...while the +10 y frame offset is absorbed by the learned origin,
    # not by moving the trajectory.
    assert abs(n0[1]) < 1.0, n0
    assert 0 in pg.fixed_frame_origin
    origin = pg.fixed_frame_origin[0]
    # origin maps fixed-frame coords to map coords: y offset ~ -10.
    assert abs(origin[1] + 10.0) < 1.0, origin


def test_invalid_fix_ignored():
    pg = make_graph_with_submaps(num_submaps=1, nodes_per_submap=2)
    pg.add_fixed_frame_pose_data(0, FixedFramePoseData(
        time=0, pose_translation=None, pose_rotation=None))
    pg.run_optimization(num_iterations=5)  # no crash, no anchoring


def test_landmark_pose_estimated():
    pg = make_graph_with_submaps(num_submaps=1, nodes_per_submap=3)
    # A landmark observed from node 1 (global pose [0,0,0]) at (2, 1).
    obs = LandmarkObservation(
        id="lm0",
        landmark_to_tracking_transform_translation=np.array([2.0, 1.0, 0.0]),
        landmark_to_tracking_transform_rotation=np.array([1.0, 0, 0, 0]),
        translation_weight=1e4, rotation_weight=1e2)
    pg.add_landmark_data(0, LandmarkData(time=1000, landmark_observations=[obs]))
    pg.run_optimization(num_iterations=20)
    assert "lm0" in pg.landmark_poses
    lm = pg.landmark_poses["lm0"]
    node = pg.nodes[NodeId(0, 1)].global_pose_2d
    np.testing.assert_allclose(lm[:2], node[:2] + [2.0, 1.0], atol=0.05)
