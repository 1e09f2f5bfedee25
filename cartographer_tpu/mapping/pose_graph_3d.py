"""3D global SLAM backend [HOST].

Reference: mapping/internal/3d/pose_graph_3d.cc (same work-queue skeleton as
2D) + constraints/constraint_builder_3d.cc (matcher cache holds the 3D BnB
matcher over both grids + the submap rotational histogram) +
optimization/optimization_problem_3d.cc.

Mirrors PoseGraph2D's synchronous host orchestration; SE(3) poses are
(translation, quaternion) numpy pairs, the solve is ops/spa_3d.py.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.core.config import PoseGraphOptions
from cartographer_tpu.core.sampler import FixedRatioSampler
from cartographer_tpu.core.time import Time
from cartographer_tpu.mapping.id import MapById, NodeId, SubmapId
from cartographer_tpu.mapping.submap_3d import Submap3D
from cartographer_tpu.ops.bnb_3d import (
    FastCorrelativeMatcherParams3D,
    build_precomputation_pyramid_3d,
    fast_correlative_match_3d,
)
from cartographer_tpu.ops.scan_matcher_3d import (
    GaussNewtonMatcherParams3D,
    gauss_newton_match_3d,
)
from cartographer_tpu.ops.spa_3d import SpaProblem3D, solve_spa_3d
from cartographer_tpu.transform import nquat
from cartographer_tpu.transform.rigid import Rigid3


@dataclasses.dataclass
class Constraint3D:
    submap_id: SubmapId
    node_id: NodeId
    rel_t: np.ndarray  # (3,)
    rel_q: np.ndarray  # (4,)
    translation_weight: float
    rotation_weight: float
    tag: str


@dataclasses.dataclass
class TrajectoryNode3D:
    time: Time
    gravity_alignment: np.ndarray
    high_res_cloud: np.ndarray  # (n, 3) tracking frame
    low_res_cloud: np.ndarray
    scan_histogram: np.ndarray
    local_pose_translation: np.ndarray
    local_pose_rotation: np.ndarray
    global_t: np.ndarray = None
    global_q: np.ndarray = None


@dataclasses.dataclass
class SubmapDataEntry3D:
    submap: Submap3D
    global_t: np.ndarray
    global_q: np.ndarray
    node_ids: Set[NodeId] = dataclasses.field(default_factory=set)
    finished: bool = False


def _compose(ta, qa, tb, qb):
    return ta + nquat.rotate(qa, tb), nquat.normalize(nquat.multiply(qa, qb))


def _inverse(t, q):
    iq = nquat.conjugate(q)
    return nquat.rotate(iq, -t), iq


class PoseGraph3D:
    def __init__(self, options: PoseGraphOptions):
        self._options = options
        cb = options.constraint_builder
        fcsm = cb.fast_correlative_scan_matcher_3d
        self._bnb_params = FastCorrelativeMatcherParams3D(
            branch_and_bound_depth=fcsm.branch_and_bound_depth,
            full_resolution_depth=fcsm.full_resolution_depth,
            min_rotational_score=fcsm.min_rotational_score,
            min_low_resolution_score=fcsm.min_low_resolution_score,
            linear_xy_search_window=fcsm.linear_xy_search_window,
            linear_z_search_window=fcsm.linear_z_search_window,
            angular_search_window=fcsm.angular_search_window)
        gn = cb.ceres_scan_matcher_3d
        self._gn_params = GaussNewtonMatcherParams3D(
            occupied_space_weight_0=gn.occupied_space_weight_0,
            occupied_space_weight_1=gn.occupied_space_weight_1,
            translation_weight=gn.translation_weight,
            rotation_weight=gn.rotation_weight,
            only_optimize_yaw=gn.only_optimize_yaw,
            num_iterations=gn.max_num_iterations)

        self.nodes: MapById[TrajectoryNode3D] = MapById()
        self.submap_data: MapById[SubmapDataEntry3D] = MapById()
        self.constraints: List[Constraint3D] = []
        self._num_nodes_since_last_optimization = 0
        self._samplers: Dict[SubmapId, FixedRatioSampler] = {}
        self._pyramids: Dict[SubmapId, jnp.ndarray] = {}
        self._frozen_trajectories: Set[int] = set()
        from cartographer_tpu.mapping.connectivity import TrajectoryConnectivityState
        self._connectivity = TrajectoryConnectivityState()
        self._match_fn = None  # jitted lazily per grid shape
        from cartographer_tpu.sensor.map_by_time import MapByTime
        self._imu_data: MapByTime = MapByTime()
        self._odometry_data: MapByTime = MapByTime()
        self.landmark_poses: Dict[str, np.ndarray] = {}
        self._frozen_landmarks: Set[str] = set()
        self._global_optimization_callbacks: List = []
        # PoseGraphInterface::TrajectoryState
        self.trajectory_states: Dict[int, str] = {}

    # ---------------------------------------------------------- sensor intake

    def add_imu_data(self, trajectory_id: int, imu_data) -> None:
        """PoseGraph3D::AddImuData -> optimization problem IMU queue."""
        try:
            self._imu_data.append(trajectory_id, imu_data.time, imu_data)
        except ValueError:
            pass  # duplicate/out-of-order IMU timestamps are dropped

    def add_odometry_data(self, trajectory_id: int, odometry_data) -> None:
        try:
            self._odometry_data.append(trajectory_id, odometry_data.time,
                                       odometry_data)
        except ValueError:
            pass

    def _integrate_imu(self, trajectory_id: int, t_start, t_end):
        """Integrate gyro + accelerometer between two times.

        Returns (delta_q (4,), delta_v (3,) in the t_start body frame,
        dt seconds) or None without IMU coverage — the discrete counterpart
        of mapping/internal/3d/imu_integration.h.
        """
        traj = self._imu_data.trajectory(trajectory_id)
        if len(traj) < 2 or traj[0][0] > t_start or traj[-1][0] < t_end:
            return None
        q = np.array([1.0, 0, 0, 0])
        v = np.zeros(3)
        prev_t = t_start
        for time, sample in traj:
            if time <= t_start:
                continue
            t = min(time, t_end)
            dt = (t - prev_t) * 1e-6
            if dt > 0:
                v = v + nquat.rotate(q, sample.linear_acceleration) * dt
                q = nquat.normalize(nquat.multiply(
                    q, nquat.from_axis_angle(sample.angular_velocity * dt)))
            prev_t = t
            if time >= t_end:
                break
        return q, v, (t_end - t_start) * 1e-6

    # ---------------------------------------------------------- connectivity

    def _find(self, t: int) -> int:
        self._connectivity.add(t)
        return self._connectivity._find(t)

    def _union(self, a: int, b: int, time: Time = 0) -> None:
        self._connectivity.connect(a, b, time)

    def transitively_connected(self, a: int, b: int) -> bool:
        return self._connectivity.transitively_connected(a, b)

    # ---------------------------------------------------------- node intake

    def add_node(self, trajectory_id: int, node: TrajectoryNode3D,
                 insertion_submaps: List[Submap3D],
                 finished_submaps: List[Submap3D]) -> NodeId:
        self._find(trajectory_id)
        self.trajectory_states.setdefault(trajectory_id, "ACTIVE")
        node_index = self.nodes.append(trajectory_id, node)
        node_id = NodeId(trajectory_id, node_index)

        submap_ids = self._register_insertion_submaps(trajectory_id, insertion_submaps)
        for sid in submap_ids:
            self.submap_data[sid].node_ids.add(node_id)

        first = self.submap_data[submap_ids[0]]
        anchor_t = first.submap.local_pose_translation
        rel_t = node.local_pose_translation - anchor_t
        node.global_t, node.global_q = _compose(
            first.global_t, first.global_q,
            nquat.rotate(nquat.conjugate(np.array([1.0, 0, 0, 0])), rel_t),
            node.local_pose_rotation)

        for sid in submap_ids:
            entry = self.submap_data[sid]
            a_t = entry.submap.local_pose_translation
            self.constraints.append(Constraint3D(
                submap_id=sid, node_id=node_id,
                rel_t=node.local_pose_translation - a_t,
                rel_q=node.local_pose_rotation.copy(),
                translation_weight=self._options.matcher_translation_weight,
                rotation_weight=self._options.matcher_rotation_weight,
                tag="INTRA_SUBMAP"))

        newly_finished: List[SubmapId] = []
        for submap in finished_submaps:
            for (tid, sindex), entry in self.submap_data.items():
                if entry.submap is submap and not entry.finished:
                    entry.finished = True
                    newly_finished.append(SubmapId(tid, sindex))

        for (tid, sindex), entry in self.submap_data.items():
            sid = SubmapId(tid, sindex)
            if entry.finished and node_id not in entry.node_ids:
                self._compute_constraint(node_id, sid)
        for sid in newly_finished:
            entry = self.submap_data[sid]
            for (tid, nindex), _ in self.nodes.items():
                nid = NodeId(tid, nindex)
                if nid not in entry.node_ids:
                    self._compute_constraint(nid, sid)

        self._num_nodes_since_last_optimization += 1
        if (self._options.optimize_every_n_nodes > 0
                and self._num_nodes_since_last_optimization
                >= self._options.optimize_every_n_nodes):
            self.run_optimization()
        return node_id

    def _register_insertion_submaps(self, trajectory_id, insertion_submaps):
        existing = {id(e.submap): SubmapId(t, i)
                    for (t, i), e in self.submap_data.items() if t == trajectory_id}
        ids = []
        for submap in insertion_submaps:
            if id(submap) in existing:
                ids.append(existing[id(submap)])
                continue
            anchor_t = np.asarray(submap.local_pose_translation, float)
            if self.submap_data.size_of_trajectory(trajectory_id) == 0:
                g_t, g_q = anchor_t.copy(), np.array([1.0, 0, 0, 0])
            else:
                last_index = self.submap_data.last_index_of_trajectory(trajectory_id)
                last = self.submap_data[SubmapId(trajectory_id, last_index)]
                la = np.asarray(last.submap.local_pose_translation, float)
                d_t = anchor_t - la
                g_t, g_q = _compose(last.global_t, last.global_q, d_t,
                                    np.array([1.0, 0, 0, 0]))
            index = self.submap_data.append(
                trajectory_id,
                SubmapDataEntry3D(submap=submap, global_t=g_t, global_q=g_q))
            ids.append(SubmapId(trajectory_id, index))
        return ids

    # ---------------------------------------------------------- loop closure

    def _compute_constraint(self, node_id: NodeId, submap_id: SubmapId) -> None:
        node = self.nodes[node_id]
        entry = self.submap_data[submap_id]
        if entry.submap.high_grid is None or len(node.high_res_cloud) == 0:
            return
        anchor_t = np.asarray(entry.submap.local_pose_translation, float)
        # Node estimate in the grid (local) frame: anchor * (submap^-1 * node).
        inv_t, inv_q = _inverse(entry.global_t, entry.global_q)
        rel_t, rel_q = _compose(inv_t, inv_q, node.global_t, node.global_q)
        init_t = anchor_t + rel_t
        if np.linalg.norm(rel_t) > self._options.constraint_builder.max_constraint_distance:
            return
        sampler = self._samplers.setdefault(
            submap_id, FixedRatioSampler(self._options.constraint_builder.sampling_ratio))
        if not sampler.pulse():
            return

        if submap_id not in self._pyramids:
            self._pyramids[submap_id] = build_precomputation_pyramid_3d(
                entry.submap.high_grid.probability(),
                self._bnb_params.branch_and_bound_depth,
                self._bnb_params.full_resolution_depth)
        pyramid = self._pyramids[submap_id]

        def pad_cloud(cloud, cap):
            out = np.zeros((cap, 3), np.float32)
            m = np.zeros(cap, bool)
            k = min(len(cloud), cap)
            out[:k] = cloud[:k]
            m[:k] = True
            return jnp.asarray(out), jnp.asarray(m)

        high_pts, high_mask = pad_cloud(node.high_res_cloud, 256)
        low_pts, low_mask = pad_cloud(node.low_res_cloud, 512)

        found, score, pose, rot_score, low_score = fast_correlative_match_3d(
            pyramid, entry.submap.high_grid, entry.submap.low_grid,
            high_pts, high_mask, low_pts, low_mask,
            jnp.asarray(node.scan_histogram, jnp.float32),
            jnp.asarray(entry.submap.histogram, jnp.float32),
            Rigid3(jnp.asarray(init_t, jnp.float32),
                   jnp.asarray(rel_q, jnp.float32)),
            self._bnb_params,
            min_score=self._options.constraint_builder.min_score)
        if not bool(found):
            return
        refined, _ = gauss_newton_match_3d(
            entry.submap.high_grid, entry.submap.low_grid,
            high_pts, high_mask, low_pts, low_mask,
            pose, self._gn_params)
        grid_t = np.asarray(refined.translation, float)
        grid_q = nquat.normalize(np.asarray(refined.rotation, float))
        self.constraints.append(Constraint3D(
            submap_id=submap_id, node_id=node_id,
            rel_t=grid_t - anchor_t, rel_q=grid_q,
            translation_weight=self._options.constraint_builder.loop_closure_translation_weight,
            rotation_weight=self._options.constraint_builder.loop_closure_rotation_weight,
            tag="INTER_SUBMAP"))
        self._union(node_id.trajectory_id, submap_id.trajectory_id, node.time)

    # ---------------------------------------------------------- optimization

    def run_optimization(self, num_iterations: Optional[int] = None) -> None:
        if self.submap_data.empty() or not self.constraints:
            self._num_nodes_since_last_optimization = 0
            return
        num_iterations = num_iterations or self._options.optimization_problem.max_num_iterations

        submap_slots: Dict[SubmapId, int] = {}
        node_slots: Dict[NodeId, int] = {}
        ts, qs, fixed = [], [], []
        for (tid, sindex), entry in self.submap_data.items():
            submap_slots[SubmapId(tid, sindex)] = len(ts)
            ts.append(entry.global_t)
            qs.append(entry.global_q)
            fixed.append(tid in self._frozen_trajectories or len(ts) == 1)
        for (tid, nindex), node in self.nodes.items():
            node_slots[NodeId(tid, nindex)] = len(ts)
            ts.append(node.global_t)
            qs.append(node.global_q)
            fixed.append(tid in self._frozen_trajectories)

        a_idx, b_idx, rel_t, rel_q, tw, rw, hub = [], [], [], [], [], [], []
        for c in self.constraints:
            if c.submap_id not in submap_slots or c.node_id not in node_slots:
                continue
            a_idx.append(submap_slots[c.submap_id])
            b_idx.append(node_slots[c.node_id])
            rel_t.append(c.rel_t)
            rel_q.append(c.rel_q)
            tw.append(c.translation_weight)
            rw.append(c.rotation_weight)
            hub.append(c.tag == "INTER_SUBMAP")

        # Consecutive-node local-SLAM constraints + IMU rotation constraints
        # (optimization_problem_3d.cc odometry/local/RotationCostFunction3D),
        # and acceleration triplets (AccelerationCostFunction3D).
        op = self._options.optimization_problem
        acc_i, acc_j, acc_k, acc_dv, acc_dt1, acc_dt2 = [], [], [], [], [], []
        for tid in self.nodes.trajectory_ids():
            if tid in self._frozen_trajectories:
                continue
            items = self.nodes.trajectory(tid)
            for (i1, n1), (i2, n2) in zip(items, items[1:]):
                inv_t, inv_q = _inverse(n1.local_pose_translation,
                                        n1.local_pose_rotation)
                r_t, r_q = _compose(inv_t, inv_q, n2.local_pose_translation,
                                    n2.local_pose_rotation)
                a_idx.append(node_slots[NodeId(tid, i1)])
                b_idx.append(node_slots[NodeId(tid, i2)])
                rel_t.append(r_t)
                rel_q.append(r_q)
                tw.append(op.local_slam_pose_translation_weight)
                rw.append(op.local_slam_pose_rotation_weight)
                hub.append(False)
                imu = self._integrate_imu(tid, n1.time, n2.time)
                if imu is not None:
                    # Gyro-integrated relative rotation: zero translation
                    # weight (RotationCostFunction3D).
                    a_idx.append(node_slots[NodeId(tid, i1)])
                    b_idx.append(node_slots[NodeId(tid, i2)])
                    rel_t.append(np.zeros(3))
                    rel_q.append(imu[0])
                    tw.append(0.0)
                    rw.append(op.rotation_weight)
                    hub.append(False)
            # Acceleration triplets over consecutive node triples.
            for (i1, n1), (i2, n2), (i3, n3) in zip(items, items[1:], items[2:]):
                imu12 = self._integrate_imu(tid, n1.time, n3.time)
                if imu12 is None:
                    continue
                # delta_v between interval midpoints, integrated in frame of
                # node 2 (approximated by the full-span integral).
                mid = self._integrate_imu(tid, n1.time, n2.time)
                full = self._integrate_imu(tid, n1.time, n3.time)
                if mid is None or full is None:
                    continue
                dv_frame1 = full[1] - mid[1]  # velocity gained in (t1..t3)-(t1..t2)
                # Rotate from frame of node1 to frame of node2.
                dv = nquat.rotate(nquat.conjugate(mid[0]), dv_frame1)
                acc_i.append(node_slots[NodeId(tid, i1)])
                acc_j.append(node_slots[NodeId(tid, i2)])
                acc_k.append(node_slots[NodeId(tid, i3)])
                acc_dv.append(dv)
                acc_dt1.append(max((n2.time - n1.time) * 1e-6, 1e-3))
                acc_dt2.append(max((n3.time - n2.time) * 1e-6, 1e-3))

        C = len(a_idx)
        cap = 1 << int(np.ceil(np.log2(max(C, 16))))

        def pad(arr, shape, dtype):
            out = np.zeros(shape, dtype)
            out[: len(arr)] = arr
            return out

        rel_q_pad = pad(rel_q, (cap, 4), np.float32)
        rel_q_pad[C:, 0] = 1.0
        A = len(acc_i)
        acc_kwargs = {}
        if A > 0:
            acap = 1 << int(np.ceil(np.log2(max(A, 8))))
            acc_kwargs = dict(
                acc_i=jnp.asarray(pad(acc_i, (acap,), np.int32)),
                acc_j=jnp.asarray(pad(acc_j, (acap,), np.int32)),
                acc_k=jnp.asarray(pad(acc_k, (acap,), np.int32)),
                acc_delta_v=jnp.asarray(pad(acc_dv, (acap, 3), np.float32)),
                acc_dt1=jnp.asarray(pad(acc_dt1, (acap,), np.float32) + 1e-3),
                acc_dt2=jnp.asarray(pad(acc_dt2, (acap,), np.float32) + 1e-3),
                acc_weight=jnp.full((acap,), op.acceleration_weight, jnp.float32),
                acc_valid=jnp.asarray(np.arange(acap) < A))
        problem = SpaProblem3D(
            translations=jnp.asarray(np.asarray(ts, np.float32)),
            rotations=jnp.asarray(np.asarray(qs, np.float32)),
            a_idx=jnp.asarray(pad(a_idx, (cap,), np.int32)),
            b_idx=jnp.asarray(pad(b_idx, (cap,), np.int32)),
            rel_t=jnp.asarray(pad(rel_t, (cap, 3), np.float32)),
            rel_q=jnp.asarray(rel_q_pad),
            trans_weight=jnp.asarray(pad(tw, (cap,), np.float32)),
            rot_weight=jnp.asarray(pad(rw, (cap,), np.float32)),
            use_huber=jnp.asarray(pad(hub, (cap,), bool)),
            valid=jnp.asarray(np.arange(cap) < C),
            fixed=jnp.asarray(np.asarray(fixed, bool)),
            **acc_kwargs)
        t_out, q_out = solve_spa_3d(
            problem, num_iterations=num_iterations,
            huber_scale=self._options.optimization_problem.huber_scale,
            fix_z=self._options.optimization_problem.fix_z_in_3d)
        t_out = np.asarray(t_out, np.float64)
        q_out = np.asarray(q_out, np.float64)

        for sid, slot in submap_slots.items():
            self.submap_data[sid].global_t = t_out[slot]
            self.submap_data[sid].global_q = q_out[slot]
        for nid, slot in node_slots.items():
            self.nodes[nid].global_t = t_out[slot]
            self.nodes[nid].global_q = q_out[slot]
        self._num_nodes_since_last_optimization = 0
        for cb in self._global_optimization_callbacks:
            cb()

    def set_global_slam_optimization_callback(self, cb) -> None:
        self._global_optimization_callbacks.append(cb)

    def run_final_optimization(self) -> None:
        self.run_optimization(self._options.max_num_final_iterations)

    def freeze_trajectory(self, trajectory_id: int) -> None:
        self._frozen_trajectories.add(trajectory_id)
        self.trajectory_states[trajectory_id] = "FROZEN"
        self._find(trajectory_id)

    def finish_trajectory(self, trajectory_id: int) -> None:
        if self.trajectory_states.get(trajectory_id) != "FROZEN":
            self.trajectory_states[trajectory_id] = "FINISHED"

    def delete_trajectory(self, trajectory_id: int) -> None:
        """PoseGraph3D::DeleteTrajectory (immediate purge, see 2D docstring)."""
        for (tid, sindex), _ in list(self.submap_data.items()):
            if tid == trajectory_id:
                del self.submap_data[SubmapId(tid, sindex)]
                self._samplers.pop(SubmapId(tid, sindex), None)
                self._pyramids.pop(SubmapId(tid, sindex), None)
        for (tid, nindex), _ in list(self.nodes.items()):
            if tid == trajectory_id:
                del self.nodes[NodeId(tid, nindex)]
        self.constraints = [
            c for c in self.constraints
            if (c.submap_id.trajectory_id != trajectory_id
                and c.node_id.trajectory_id != trajectory_id)]
        self._imu_data.delete_trajectory(trajectory_id)
        self._odometry_data.delete_trajectory(trajectory_id)
        self._frozen_trajectories.discard(trajectory_id)
        self.trajectory_states[trajectory_id] = "DELETED"

    def set_landmark_pose(self, landmark_id: str, global_pose,
                          frozen: bool = False) -> None:
        self.landmark_poses[landmark_id] = np.asarray(global_pose, np.float64)
        if frozen:
            self._frozen_landmarks.add(landmark_id)

    def get_landmark_poses(self) -> Dict[str, np.ndarray]:
        return dict(self.landmark_poses)

    def num_inter_constraints(self) -> int:
        return sum(1 for c in self.constraints if c.tag == "INTER_SUBMAP")

    def local_to_global(self, trajectory_id: int):
        """Local SLAM frame → global frame SE(3) transform (t, q).

        Reference pose_graph_3d.cc ComputeLocalToGlobalTransform: offset of
        the trajectory's last submap, global_pose * local_pose^-1; identity
        before any submap exists.
        """
        last = None
        for (t, i), entry in self.submap_data.items():
            if t == trajectory_id and (last is None or i > last[0]):
                last = (i, entry)
        if last is None:
            return np.zeros(3), np.array([1.0, 0.0, 0.0, 0.0])
        entry = last[1]
        it, iq = _inverse(np.asarray(entry.submap.local_pose_translation, float),
                          np.asarray(entry.submap.local_pose_rotation, float))
        return _compose(entry.global_t, entry.global_q, it, iq)
