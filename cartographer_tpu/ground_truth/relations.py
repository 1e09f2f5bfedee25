"""Relation-based ground truth + metrics.

Reference equivalents:
- ground_truth/autogenerate_ground_truth.cc: from an optimized pose graph,
  each INTER_SUBMAP loop-closure constraint whose trajectory arc between the
  two involved nodes is at least `min_covered_distance`, and which is not an
  outlier (translational/rotational deviation vs the optimized solution
  below thresholds), yields one ground-truth relation — the *locally
  measured* relative pose between the two node times.
- ground_truth/compute_relations_metrics_main.cc: interpolate a test
  trajectory at both relation timestamps and accumulate abs translational /
  rotational error statistics.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Tuple

import numpy as np

from cartographer_tpu.core.time import Time
from cartographer_tpu.mapping.id import NodeId
from cartographer_tpu.mapping.pose_graph_2d import PoseGraph2D, _compose2d, _inverse2d
from cartographer_tpu.transform import nquat
from cartographer_tpu.transform.interpolation import TransformInterpolationBuffer


@dataclasses.dataclass
class GroundTruthRelation:
    time1: Time
    time2: Time
    expected_translation: np.ndarray  # (3,)
    expected_rotation: np.ndarray  # (4,)
    covered_distance: float


def _covered_distance(node_items: List[Tuple[int, object]], i1: int, i2: int) -> float:
    lo, hi = min(i1, i2), max(i1, i2)
    dist = 0.0
    prev = None
    for index, node in node_items:
        if lo <= index <= hi:
            p = node.global_pose_2d[:2]
            if prev is not None:
                dist += float(np.linalg.norm(p - prev))
            prev = p
    return dist


def autogenerate_ground_truth(
    pose_graph: PoseGraph2D,
    min_covered_distance: float = 100.0,
    outlier_threshold_meters: float = 0.15,
    outlier_threshold_radians: float = 0.02,
) -> List[GroundTruthRelation]:
    """2D variant of autogenerate_ground_truth.cc."""
    relations: List[GroundTruthRelation] = []
    # Submap -> earliest node (the submap's "own" reference node is the first
    # node inserted into it; the reference uses the submap trajectory nodes).
    for c in pose_graph.constraints:
        if c.tag != "INTER_SUBMAP":
            continue
        entry = pose_graph.submap_data.get(c.submap_id)
        if entry is None or not entry.node_ids:
            continue
        # Reference: relation between the constraint's node and the first
        # node of the submap.
        first_node_id = min(entry.node_ids)
        if first_node_id.trajectory_id != c.node_id.trajectory_id:
            continue
        node_items = pose_graph.nodes.trajectory(c.node_id.trajectory_id)
        covered = _covered_distance(
            node_items, first_node_id.node_index, c.node_id.node_index)
        if covered < min_covered_distance:
            continue
        node1 = pose_graph.nodes[first_node_id]
        node2 = pose_graph.nodes[c.node_id]
        # Outlier gate (autogenerate_ground_truth.cc): the constraint-measured
        # node-in-submap pose must agree with the optimized solution.
        opt_node_in_submap = _compose2d(
            _inverse2d(entry.global_pose_2d), node2.global_pose_2d)
        diff = _compose2d(_inverse2d(opt_node_in_submap), c.rel)
        if (np.linalg.norm(diff[:2]) > outlier_threshold_meters
                or abs(diff[2]) > outlier_threshold_radians):
            continue
        # Relative FULL pose from the optimized solution: a node's rotation
        # is Embed3D(theta) * gravity_alignment — theta alone is yaw in the
        # gravity-aligned frame, not the heading (trajectory_node.h
        # global_pose semantics).
        q1 = nquat.normalize(nquat.multiply(
            nquat.from_yaw(node1.global_pose_2d[2]), node1.gravity_alignment))
        q2 = nquat.normalize(nquat.multiply(
            nquat.from_yaw(node2.global_pose_2d[2]), node2.gravity_alignment))
        d = np.array([node2.global_pose_2d[0] - node1.global_pose_2d[0],
                      node2.global_pose_2d[1] - node1.global_pose_2d[1], 0.0])
        iq1 = nquat.conjugate(q1)
        relations.append(GroundTruthRelation(
            time1=node1.time, time2=node2.time,
            expected_translation=nquat.rotate(iq1, d),
            expected_rotation=nquat.normalize(nquat.multiply(iq1, q2)),
            covered_distance=covered))
    return relations


def autogenerate_ground_truth_3d(
    pose_graph,
    min_covered_distance: float = 100.0,
    outlier_threshold_meters: float = 0.15,
    outlier_threshold_radians: float = 0.02,
) -> List[GroundTruthRelation]:
    """SE(3) variant of autogenerate_ground_truth.cc for PoseGraph3D."""

    def inv(t, q):
        iq = nquat.conjugate(q)
        return -nquat.rotate(iq, t), iq

    def compose(ta, qa, tb, qb):
        return ta + nquat.rotate(qa, tb), nquat.normalize(nquat.multiply(qa, qb))

    relations: List[GroundTruthRelation] = []
    for c in pose_graph.constraints:
        if c.tag != "INTER_SUBMAP":
            continue
        entry = pose_graph.submap_data.get(c.submap_id)
        if entry is None or not entry.node_ids:
            continue
        first_node_id = min(entry.node_ids)
        if first_node_id.trajectory_id != c.node_id.trajectory_id:
            continue
        node_items = pose_graph.nodes.trajectory(c.node_id.trajectory_id)
        lo = min(first_node_id.node_index, c.node_id.node_index)
        hi = max(first_node_id.node_index, c.node_id.node_index)
        covered, prev = 0.0, None
        for index, node in node_items:
            if lo <= index <= hi:
                p = node.global_t
                if prev is not None:
                    covered += float(np.linalg.norm(p - prev))
                prev = p
        if covered < min_covered_distance:
            continue
        node1 = pose_graph.nodes[first_node_id]
        node2 = pose_graph.nodes[c.node_id]
        it, iq = inv(node1.global_t, node1.global_q)
        rel_t, rel_q = compose(it, iq, node2.global_t, node2.global_q)
        # Outlier gate vs the constraint measurement.
        ist, isq = inv(entry.global_t, entry.global_q)
        opt_t, opt_q = compose(ist, isq, node2.global_t, node2.global_q)
        iot, ioq = inv(opt_t, opt_q)
        dt, dq = compose(iot, ioq, np.asarray(c.rel_t), np.asarray(c.rel_q))
        if (np.linalg.norm(dt) > outlier_threshold_meters
                or abs(nquat.angle(dq)) > outlier_threshold_radians):
            continue
        relations.append(GroundTruthRelation(
            time1=node1.time, time2=node2.time,
            expected_translation=np.asarray(rel_t, float),
            expected_rotation=np.asarray(rel_q, float),
            covered_distance=covered))
    return relations


@dataclasses.dataclass
class RelationMetrics:
    abs_translational_error_mean: float
    abs_translational_error_dev: float
    abs_rotational_error_mean: float
    abs_rotational_error_dev: float
    num_relations: int

    def __str__(self) -> str:
        return (f"Abs translational error {self.abs_translational_error_mean:.5f} "
                f"+/- {self.abs_translational_error_dev:.5f} m\n"
                f"Abs rotational error "
                f"{math.degrees(self.abs_rotational_error_mean):.5f} +/- "
                f"{math.degrees(self.abs_rotational_error_dev):.5f} deg")


def compute_relations_metrics(
    relations: List[GroundTruthRelation],
    trajectory: TransformInterpolationBuffer,
) -> RelationMetrics:
    """compute_relations_metrics_main.cc: error of the test trajectory's
    relative poses against the ground-truth relations."""
    trans_errors = []
    rot_errors = []
    used = 0
    for r in relations:
        if not (trajectory.has(r.time1) and trajectory.has(r.time2)):
            continue
        t1, q1 = trajectory.lookup(r.time1)
        t2, q2 = trajectory.lookup(r.time2)
        inv_q1 = nquat.conjugate(q1)
        rel_t = nquat.rotate(inv_q1, t2 - t1)
        rel_q = nquat.multiply(inv_q1, q2)
        err_t = np.linalg.norm(rel_t - r.expected_translation)
        err_q = nquat.angle(nquat.multiply(nquat.conjugate(r.expected_rotation), rel_q))
        trans_errors.append(err_t)
        rot_errors.append(abs(err_q))
        used += 1
    if used == 0:
        return RelationMetrics(0.0, 0.0, 0.0, 0.0, 0)
    te = np.asarray(trans_errors)
    re = np.asarray(rot_errors)
    return RelationMetrics(
        float(te.mean()), float(te.std()),
        float(re.mean()), float(re.std()), used)
