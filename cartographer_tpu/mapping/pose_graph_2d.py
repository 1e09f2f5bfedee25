"""2D global SLAM backend [HOST].

Reference: mapping/internal/2d/pose_graph_2d.cc (1,340 LoC) +
optimization/optimization_problem_2d.cc. Keeps node/submap bookkeeping,
schedules loop-closure searches through ConstraintBuilder2D, runs the SPA
solve every `optimize_every_n_nodes` nodes, and maintains trajectory
connectivity.

TPU design: the reference's work-queue + thread-pool concurrency becomes
synchronous host orchestration around batched device programs (each BnB
match already saturates the chip); the SPA solve is one jitted Gauss-Newton
program (ops/spa.py) over padded constraint arrays, rebuilt per
power-of-two problem size to bound recompilation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Set, Tuple

import jax.numpy as jnp
import numpy as np

from cartographer_tpu.core.config import PoseGraphOptions
from cartographer_tpu.core.sampler import FixedRatioSampler
from cartographer_tpu.core.time import Time, from_seconds
from cartographer_tpu.mapping.constraint_builder_2d import Constraint, ConstraintBuilder2D
from cartographer_tpu.mapping.id import MapById, NodeId, SubmapId
from cartographer_tpu.mapping.submap_2d import Submap2D
from cartographer_tpu.transform import nquat


@dataclasses.dataclass
class TrajectoryNode:
    """Node data kept by the pose graph (trajectory_node.h)."""

    time: Time
    gravity_alignment: np.ndarray  # (4,)
    filtered_points: np.ndarray  # (n, 2) gravity-aligned scan for loop closure
    local_pose_translation: np.ndarray  # (3,)
    local_pose_rotation: np.ndarray  # (4,)
    global_pose_2d: np.ndarray = None  # (3,) [x, y, theta], optimized


@dataclasses.dataclass
class SubmapDataEntry:
    submap: Submap2D
    global_pose_2d: np.ndarray  # (3,)
    node_ids: Set[NodeId] = dataclasses.field(default_factory=set)
    finished: bool = False
    frozen: bool = False


from functools import lru_cache


@lru_cache(maxsize=None)
def _single_device_mesh(device):
    from jax.sharding import Mesh
    return Mesh(np.asarray([device]), ("pairs",))


def _pose2d_of_node(node: TrajectoryNode) -> np.ndarray:
    """Gravity-aligned 2D local pose of a node: Project2D(pose * g^-1)."""
    q = nquat.multiply(node.local_pose_rotation, nquat.conjugate(node.gravity_alignment))
    return np.array([node.local_pose_translation[0], node.local_pose_translation[1],
                     nquat.get_yaw(q)])


def _compose2d(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    c, s = np.cos(a[2]), np.sin(a[2])
    return np.array([a[0] + c * b[0] - s * b[1], a[1] + s * b[0] + c * b[1], a[2] + b[2]])


def _inverse2d(a: np.ndarray) -> np.ndarray:
    c, s = np.cos(a[2]), np.sin(a[2])
    return np.array([-(c * a[0] + s * a[1]), -(-s * a[0] + c * a[1]), -a[2]])


class PoseGraph2D:
    def __init__(self, options: PoseGraphOptions, num_background_threads: int = 0,
                 mesh=None):
        """`num_background_threads` > 0 enables the reference's pipelined
        frontend/backend concurrency (SURVEY.md P2): loop-closure searches run
        as background tasks (device dispatches release the GIL) while the
        frontend keeps feeding nodes; optimization waits for the pending
        batch like ConstraintBuilder2D::WhenDone. `mesh` (with a `pairs`
        axis) shards constraint-search batches across chips (SURVEY.md P1).

        Under a jax.distributed process group (jax.process_count() > 1) the
        graph runs MULTIHOST: constraint batches split round-robin across
        processes (results allgathered), and the Schur solve runs on the
        global mesh with cross-process collectives (SURVEY.md P5; the
        reference's cross-machine tier is gRPC between whole servers,
        cloud/internal/local_trajectory_uploader.cc:145-180 — here the
        numeric core itself spans hosts). Every process must feed the same
        node stream (replicated ingestion) and run synchronously."""
        import jax as _jax
        self._options = options
        self._multihost = _jax.process_count() > 1
        if self._multihost and mesh is None:
            from cartographer_tpu.parallel.multihost import global_mesh
            mesh = global_mesh()
        self._mesh = mesh
        # In multihost mode constraint matching runs on LOCAL devices (the
        # batch is split across processes host-side); the global mesh is for
        # the solve.
        cb_mesh = mesh
        if self._multihost:
            from jax.sharding import Mesh
            local = _jax.local_devices()
            cb_mesh = Mesh(np.asarray(local), ("pairs",))
        self._constraint_builder = ConstraintBuilder2D(
            options.constraint_builder, mesh=cb_mesh,
            multihost=self._multihost)
        self._executor = None
        self._pending_futures: List = []
        self._pending_pairs: List = []
        self._drain_active = False
        import threading
        self._result_lock = threading.Lock()
        self._futures_lock = threading.Lock()
        # Metrics (pose_graph_2d.cc:44-50 work-queue gauges + constraint
        # counters).
        from cartographer_tpu import metrics as m
        factory = m.GLOBAL_FACTORY
        counts = factory.new_counter_family(
            "mapping_2d_pose_graph_constraints",
            "Constraints added to the pose graph")
        self._metric_intra = counts.add({"tag": "intra_submap"})
        self._metric_inter = counts.add({"tag": "inter_submap"})
        self._metric_optimizations = factory.new_counter_family(
            "mapping_2d_pose_graph_optimizations",
            "Pose graph optimization runs").add({})
        self._metric_pending = factory.new_gauge_family(
            "mapping_2d_pose_graph_work_queue_depth",
            "Pending background constraint searches").add({})
        self._optimizer_executor = None
        self._optimization_future = None
        if num_background_threads > 0:
            from concurrent.futures import ThreadPoolExecutor
            self._executor = ThreadPoolExecutor(
                max_workers=num_background_threads,
                thread_name_prefix="constraint")
            # A single optimizer thread serializes SPA solves, mirroring the
            # reference's work queue: the frontend never blocks on
            # optimization (pose_graph_2d.cc:520-544 DrainWorkQueue).
            self._optimizer_executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="optimizer")
        self.nodes: MapById[TrajectoryNode] = MapById()
        self.submap_data: MapById[SubmapDataEntry] = MapById()
        self.constraints: List[Constraint] = []
        self._num_nodes_since_last_optimization = 0
        # Per-trajectory global localization samplers
        # (pose_graph_2d.cc:200-205).
        self._global_samplers: Dict[int, FixedRatioSampler] = {}
        self._frozen_trajectories: Set[int] = set()
        from cartographer_tpu.mapping.connectivity import TrajectoryConnectivityState
        self._connectivity = TrajectoryConnectivityState()
        self._global_optimization_callbacks = []
        self._trimmers: List = []
        # Sensor streams for the optimization problem
        # (optimization_problem_2d.cc odometry / fixed-frame / landmarks).
        from cartographer_tpu.sensor.map_by_time import MapByTime
        self._odometry_data: MapByTime = MapByTime()
        self._fixed_frame_data: MapByTime = MapByTime()
        # Learned fixed-frame-origin-in-map per trajectory, [x, y, theta]
        # (optimization_problem_2d.cc C_fixed_frames / TrajectoryData).
        self.fixed_frame_origin: Dict[int, np.ndarray] = {}
        self._landmark_observations: List = []  # (trajectory_id, LandmarkData)
        self.landmark_poses: Dict[str, np.ndarray] = {}
        self._frozen_landmarks: Set[str] = set()
        # PoseGraphInterface::TrajectoryState (ACTIVE/FINISHED/FROZEN/DELETED)
        self.trajectory_states: Dict[int, str] = {}

    # ------------------------------------------------------------ connectivity

    def _find(self, t: int) -> int:
        self._connectivity.add(t)
        return self._connectivity._find(t)

    def _union(self, a: int, b: int, time: Time = 0) -> None:
        self._connectivity.connect(a, b, time)

    def transitively_connected(self, a: int, b: int) -> bool:
        return self._connectivity.transitively_connected(a, b)

    def _global_sampler_for(self, trajectory_id: int) -> FixedRatioSampler:
        if trajectory_id not in self._global_samplers:
            self._global_samplers[trajectory_id] = FixedRatioSampler(
                self._options.global_sampling_ratio)
        return self._global_samplers[trajectory_id]

    # ------------------------------------------------------------ node intake

    def add_node(self, trajectory_id: int, node: TrajectoryNode,
                 insertion_submaps: List[Submap2D],
                 finished_submaps: List[Submap2D]) -> NodeId:
        """Equivalent of PoseGraph2D::AddNode + ComputeConstraintsForNode
        (pose_graph_2d.cc:126-170, 312-402); bookkeeping under the graph
        lock, searches possibly on the background pool."""
        with self._result_lock:
            self._find(trajectory_id)
            self.trajectory_states.setdefault(trajectory_id, "ACTIVE")
            node_index = self.nodes.append(trajectory_id, node)
            node_id = NodeId(trajectory_id, node_index)

            # Register insertion submaps (the <= 2 active ones).
            submap_ids = self._register_insertion_submaps(
                trajectory_id, insertion_submaps)
            for sid, submap in zip(submap_ids, insertion_submaps):
                self.submap_data[sid].node_ids.add(node_id)

            node_pose_2d = _pose2d_of_node(node)
            # Global pose from the first insertion submap's optimized pose.
            first = self.submap_data[submap_ids[0]]
            local_submap_pose = self._submap_local_pose_2d(first.submap)
            node.global_pose_2d = _compose2d(
                first.global_pose_2d,
                _compose2d(_inverse2d(local_submap_pose), node_pose_2d))

            # INTRA constraints to the insertion submaps.
            for sid in submap_ids:
                entry = self.submap_data[sid]
                rel = _compose2d(
                    _inverse2d(self._submap_local_pose_2d(entry.submap)),
                    node_pose_2d)
                self.constraints.append(Constraint(
                    submap_id=sid, node_id=node_id, rel=rel,
                    translation_weight=self._options.matcher_translation_weight,
                    rotation_weight=self._options.matcher_rotation_weight,
                    tag="INTRA_SUBMAP"))
                self._metric_intra.increment()

            # Mark newly finished submaps and search their loop closures.
            newly_finished: List[SubmapId] = []
            for submap in finished_submaps:
                for (tid, sindex), entry in self.submap_data.items():
                    if entry.submap is submap and not entry.finished:
                        entry.finished = True
                        newly_finished.append(SubmapId(tid, sindex))

            # Loop closure pairs: this node vs all finished submaps, and all
            # old nodes vs newly finished submaps.
            pairs = []
            for (tid, sindex), entry in self.submap_data.items():
                sid = SubmapId(tid, sindex)
                if entry.finished and node_id not in entry.node_ids:
                    pairs.append((node_id, sid))
            for sid in newly_finished:
                entry = self.submap_data[sid]
                for (tid, nindex), _ in self.nodes.items():
                    nid = NodeId(tid, nindex)
                    if nid not in entry.node_ids:
                        pairs.append((nid, sid))
        self._schedule_constraints(pairs)

        self._num_nodes_since_last_optimization += 1
        if (self._options.optimize_every_n_nodes > 0
                and self._num_nodes_since_last_optimization
                >= self._options.optimize_every_n_nodes):
            self._schedule_optimization()
        return node_id

    def _schedule_optimization(self) -> None:
        """Run the SPA solve on the optimizer thread when in background mode
        (the frontend keeps adding nodes; un-optimized tail poses are
        extrapolated at write-back), inline otherwise."""
        if self._optimizer_executor is None:
            self.run_optimization()
            return
        if self._optimization_future is not None and not self._optimization_future.done():
            return  # one solve at a time; the next cadence re-triggers
        self._num_nodes_since_last_optimization = 0
        self._optimization_future = self._optimizer_executor.submit(
            self.run_optimization)

    def wait_for_optimization(self) -> None:
        future, self._optimization_future = self._optimization_future, None
        if future is not None:
            future.result()

    def _submap_local_pose_2d(self, submap: Submap2D) -> np.ndarray:
        q = submap.local_pose_rotation
        return np.array([submap.local_pose_translation[0],
                         submap.local_pose_translation[1], nquat.get_yaw(q)])

    def _register_insertion_submaps(self, trajectory_id: int,
                                    insertion_submaps: List[Submap2D]) -> List[SubmapId]:
        """Match host submap objects to graph entries, appending new ones
        (InitializeGlobalSubmapPoses, pose_graph_2d.cc:204-259)."""
        existing = {id(entry.submap): SubmapId(tid, sindex)
                    for (tid, sindex), entry in self.submap_data.items()
                    if tid == trajectory_id}
        ids = []
        for submap in insertion_submaps:
            if id(submap) in existing:
                ids.append(existing[id(submap)])
                continue
            local = self._submap_local_pose_2d(submap)
            if self.submap_data.size_of_trajectory(trajectory_id) == 0:
                global_pose = local.copy()
            else:
                # global = last_global * last_local^-1 * local
                last_index = self.submap_data.last_index_of_trajectory(trajectory_id)
                last = self.submap_data[SubmapId(trajectory_id, last_index)]
                global_pose = _compose2d(
                    last.global_pose_2d,
                    _compose2d(_inverse2d(self._submap_local_pose_2d(last.submap)), local))
            index = self.submap_data.append(
                trajectory_id, SubmapDataEntry(submap=submap, global_pose_2d=global_pose))
            ids.append(SubmapId(trajectory_id, index))
        return ids

    # ------------------------------------------------------------ sensor intake

    def add_odometry_data(self, trajectory_id: int, odometry_data) -> None:
        """PoseGraph2D::AddOdometryData -> OptimizationProblem queue."""
        self._odometry_data.append(trajectory_id, odometry_data.time, odometry_data)

    def add_fixed_frame_pose_data(self, trajectory_id: int, data) -> None:
        if data.pose_translation is None:
            return  # invalid fix
        self._fixed_frame_data.append(trajectory_id, data.time, data)

    def add_landmark_data(self, trajectory_id: int, data) -> None:
        self._landmark_observations.append((trajectory_id, data))

    def _odometry_poses_at(self, trajectory_id: int, times):
        """Interpolated odometry poses [x, y, theta] at the given (sorted)
        node times; None where the buffer doesn't bracket the time. ONE
        sorted sweep, O(M + N log M) — replaces the per-pair O(M) lookups of
        CalculateOdometryBetweenNodes that made each optimization O(N^2)."""
        import bisect

        traj = self._odometry_data.trajectory(trajectory_id)
        out = [None] * len(times)
        if len(traj) < 2:
            return out
        tlist = [e[0] for e in traj]

        def pose_of(d):
            return np.array([d.pose_translation[0], d.pose_translation[1],
                             nquat.get_yaw(d.pose_rotation)])

        for k, t in enumerate(times):
            if t < tlist[0] or t > tlist[-1]:
                continue
            i = bisect.bisect_left(tlist, t)
            if tlist[i] == t or i == 0:
                out[k] = pose_of(traj[min(i, len(traj) - 1)][1])
                continue
            f = (t - tlist[i - 1]) / (tlist[i] - tlist[i - 1])
            ta = pose_of(traj[i - 1][1])
            tb = pose_of(traj[i][1])
            # Yaw interpolates along the SHORTEST arc: crossing the +-pi
            # seam with plain linear interpolation produces a ~pi-wrong
            # pose whose (high-weight) odometry residual drags the solve
            # meters off (found by the official-pbstream replay eval: a
            # full-circle trajectory crosses the seam twice per loop).
            dth = (tb[2] - ta[2] + np.pi) % (2.0 * np.pi) - np.pi
            out[k] = np.array([ta[0] + f * (tb[0] - ta[0]),
                               ta[1] + f * (tb[1] - ta[1]),
                               ta[2] + f * dth])
        return out

    def _odometry_relative(self, trajectory_id: int, t1, t2):
        """Interpolated odometry relative pose between two times, or None
        (CalculateOdometryBetweenNodes)."""
        p1, p2 = self._odometry_poses_at(trajectory_id, [t1, t2])
        if p1 is None or p2 is None:
            return None
        return _compose2d(_inverse2d(p1), p2)

    # ------------------------------------------------------------ loop closure

    def _schedule_constraints(self, pairs) -> None:
        """Dispatch candidate (node, submap) pairs as batched search work
        (vmapped/mesh-sharded device programs inside), inline or on the
        background pool. Pending pairs COALESCE ACROSS NODES: a single
        drain worker slurps everything queued into large
        compute_constraints calls — when the device falls behind the
        frontend, the backlog compacts into few big programs (+ one fetch
        each) instead of one small batch per node. This is the production
        form of the reference's per-pair thread-pool fan-out
        (constraint_builder_2d.cc:102-186)."""
        if not pairs:
            return
        if self._executor is None:
            self._compute_constraints_batch(pairs)
            return
        with self._futures_lock:
            self._pending_pairs.extend(pairs)
            if not self._drain_active:
                self._drain_active = True
                self._pending_futures.append(
                    self._executor.submit(self._drain_pending_pairs))
            self._metric_pending.set(len(self._pending_pairs))

    # Pairs per coalesced compute_constraints call: bounds request-build
    # latency while still amortizing the per-call device fetch.
    _DRAIN_SLURP = 512

    def _drain_pending_pairs(self) -> None:
        while True:
            with self._futures_lock:
                chunk = self._pending_pairs[: self._DRAIN_SLURP]
                self._pending_pairs = self._pending_pairs[self._DRAIN_SLURP:]
                if not chunk:
                    self._drain_active = False
                    return
                self._metric_pending.set(len(self._pending_pairs))
            self._compute_constraints_batch(chunk)

    def _schedule_constraint(self, node_id: NodeId, submap_id: SubmapId) -> None:
        self._schedule_constraints([(node_id, submap_id)])

    def wait_for_all_computations(self) -> None:
        """WaitForAllComputations (pose_graph_2d.cc:546+,841-859): drain
        pending background constraint searches AND the in-flight solve, so
        every entry point that observes the graph (FinishTrajectory, final
        optimization, serialization, query RPCs) sees a consistent state.
        Loops because a draining solve may itself have been scheduled while
        new searches were still being appended."""
        while True:
            with self._futures_lock:
                futures, self._pending_futures = self._pending_futures, []
            if not futures:
                break
            for f in futures:
                f.result()

    def _compute_constraints_batch(self, pairs) -> None:
        """ComputeConstraint (pose_graph_2d.cc:261-310) over a batch of
        (node_id, submap_id) pairs: local window when connected recently,
        global search otherwise; all surviving requests matched in one
        batched device dispatch (constraint_builder_2d.compute_constraints).

        Frames: grids live in the trajectory-local frame; each submap's SPA
        frame is anchored at the submap origin A (pure translation), so
        grid-frame pose = A * rel and constraint rel = A^-1 * grid_pose.
        Anchoring at the submap (not the trajectory origin) keeps rotation
        corrections acting about the submap content — matching the
        reference's submap local_pose convention.
        """
        requests = []
        anchors = {}
        node_times = {}
        for node_id, submap_id in pairs:
            node = self.nodes.get(node_id)
            entry = self.submap_data.get(submap_id)
            if node is None or entry is None or entry.submap.grid is None:
                continue
            if node.filtered_points is None or len(node.filtered_points) == 0:
                continue
            anchor = self._submap_local_pose_2d(entry.submap)
            with self._result_lock:
                # Recency gate (pose_graph_2d.cc:277-289): local window only
                # when the trajectories were DIRECTLY connected recently; a
                # stale connection falls back to sampled global search.
                last_conn = self._connectivity.last_connection_time(
                    node_id.trajectory_id, submap_id.trajectory_id)
                recent = (last_conn is not None and node.time < last_conn
                          + from_seconds(
                              self._options.global_constraint_search_after_n_seconds))
                is_local = (node_id.trajectory_id == submap_id.trajectory_id
                            or recent)
                global_pulse = (
                    False if is_local else
                    self._global_sampler_for(node_id.trajectory_id).pulse())
            req = None
            if is_local:
                # Node pose estimate in the grid (local) frame:
                # A * (submap_global^-1 * node_global).
                rel_est = _compose2d(_inverse2d(entry.global_pose_2d),
                                     node.global_pose_2d)
                init = _compose2d(anchor, rel_est)
                req = self._constraint_builder.begin_constraint(
                    submap_id, entry.submap.grid, node_id,
                    node.filtered_points, init,
                    relative_distance=float(np.linalg.norm(rel_est[:2])))
            elif global_pulse:
                req = self._constraint_builder.begin_global_constraint(
                    submap_id, entry.submap.grid, node_id,
                    node.filtered_points)
            if req is not None:
                requests.append(req)
                anchors[(node_id, submap_id)] = anchor
                node_times[node_id] = node.time

        for constraint in self._constraint_builder.compute_constraints(requests):
            # The matcher returns the node pose in the grid frame; re-anchor.
            anchor = anchors[(constraint.node_id, constraint.submap_id)]
            constraint.rel = _compose2d(_inverse2d(anchor), constraint.rel)
            with self._result_lock:
                # A trimmer may have removed either endpoint while the
                # search ran; a dangling constraint must not be appended
                # (the reference serializes trimming and result merging in
                # one work queue, pose_graph_2d.cc:444-493).
                if (constraint.submap_id not in self.submap_data
                        or constraint.node_id not in self.nodes):
                    continue
                self.constraints.append(constraint)
                # Connect with the node time so the recency window starts now
                # (pose_graph_2d.cc:422 HandleWorkQueue).
                self._union(constraint.node_id.trajectory_id,
                            constraint.submap_id.trajectory_id,
                            node_times[constraint.node_id])
            self._metric_inter.increment()

    # ------------------------------------------------------------ optimization

    def run_optimization(self, num_iterations: Optional[int] = None) -> None:
        """Build the SPA problem and solve (HandleWorkQueue + RunOptimization,
        pose_graph_2d.cc:444-518, 861-908).

        Production solver: the submap/node-partitioned Schur-complement
        Gauss-Newton (parallel/schur_spa.py) — node blocks eliminated
        against the (few) submap blocks, B kept sparse, constraints sharded
        over the mesh when present. No (3(S+N))^2 system is ever
        materialized (reference: Ceres sparse solve,
        optimization_problem_2d.cc:240). Assembly is O(S + N + C): the
        per-pair odometry lookups that made the old build O(N^2) are one
        sorted sweep per trajectory (_odometry_poses_at).
        """
        self.wait_for_all_computations()
        self._metric_optimizations.increment()
        if self.submap_data.empty() or not self.constraints:
            self._num_nodes_since_last_optimization = 0
            return
        num_iterations = num_iterations or self._options.optimization_problem.max_num_iterations

        # Snapshot the problem under the graph lock; the device solve below
        # runs lock-free while the frontend keeps appending (the appended
        # tail is extrapolated at write-back, pose_graph_2d.cc:874-908).
        self._result_lock.acquire()
        try:
            # Submap-side slots: submaps first, landmark slots appended after
            # (landmarks couple only to nodes — the same two-block structure).
            submap_slots: Dict[SubmapId, int] = {}
            node_slots: Dict[NodeId, int] = {}
            sub_poses, sub_fixed = [], []
            node_poses, node_fixed = [], []
            for (tid, sindex), entry in self.submap_data.items():
                submap_slots[SubmapId(tid, sindex)] = len(sub_poses)
                sub_poses.append(entry.global_pose_2d)
                sub_fixed.append(tid in self._frozen_trajectories
                                 or len(sub_poses) == 1)
            for (tid, nindex), node in self.nodes.items():
                node_slots[NodeId(tid, nindex)] = len(node_poses)
                node_poses.append(node.global_pose_2d)
                node_fixed.append(tid in self._frozen_trajectories)
            # Anchor for tail extrapolation: the last snapshotted submap pose of
            # each trajectory, before and (later) after the solve.
            tail_anchor: Dict[int, SubmapId] = {}
            for (tid, sindex), _ in self.submap_data.items():
                tail_anchor[tid] = SubmapId(tid, sindex)
            anchor_old = {tid: self.submap_data[sid].global_pose_2d.copy()
                          for tid, sid in tail_anchor.items()}

            # --- submap-node constraints (INTRA/INTER + landmarks below) ---
            a_idx, b_idx, rels, tws, rws, hubers = [], [], [], [], [], []
            for c in self.constraints:
                if c.submap_id not in submap_slots or c.node_id not in node_slots:
                    continue
                # INTRA rel is node-in-submap-local-frame; convert to grid frame
                # (identical here because grids live in the local frame).
                a_idx.append(submap_slots[c.submap_id])
                b_idx.append(node_slots[c.node_id])
                rels.append(c.rel)
                tws.append(c.translation_weight)
                rws.append(c.rotation_weight)
                hubers.append(c.tag == "INTER_SUBMAP")

            # --- consecutive-node terms from local SLAM and odometry ---
            # optimization_problem_2d.cc:304-349: without them the relative
            # motion between nodes is only constrained through shared submaps.
            op = self._options.optimization_problem
            j_idx, nn_rels, nn_tws, nn_rws = [], [], [], []
            for tid in self.nodes.trajectory_ids():
                if tid in self._frozen_trajectories:
                    continue
                items = self.nodes.trajectory(tid)
                odo = self._odometry_poses_at(tid, [n.time for _, n in items])
                for k, ((i1, n1), (i2, n2)) in enumerate(zip(items, items[1:])):
                    if i2 != i1 + 1:
                        # Trimmed gap: the reference skips relative constraints
                        # across non-consecutive node indices
                        # (optimization_problem_2d.cc:320-322).
                        continue
                    s1 = node_slots[NodeId(tid, i1)]
                    # Node slots of one trajectory are contiguous (MapById
                    # iterates per-trajectory in index order), the Schur T block
                    # stays tridiagonal.
                    p1 = _pose2d_of_node(n1)
                    p2 = _pose2d_of_node(n2)
                    j_idx.append(s1)
                    nn_rels.append(_compose2d(_inverse2d(p1), p2))
                    nn_tws.append(op.local_slam_pose_translation_weight)
                    nn_rws.append(op.local_slam_pose_rotation_weight)
                    if odo[k] is not None and odo[k + 1] is not None:
                        j_idx.append(s1)
                        nn_rels.append(_compose2d(_inverse2d(odo[k]), odo[k + 1]))
                        nn_tws.append(op.odometry_translation_weight)
                        nn_rws.append(op.odometry_rotation_weight)

            # --- fixed-frame (GPS) constraints with a learned per-trajectory
            # origin (optimization_problem_2d.cc:351-394: C_fixed_frames pose
            # block initialized from the first constrained node, persisted via
            # fixed_frame_origin_in_map). The origin is a submap-side slot
            # coupled to every node inside the fix time range by the
            # time-interpolated fix — like landmarks, it Schur-eliminates. ---
            from cartographer_tpu.mapping.pose_graph_3d import (
                _interpolate_fixed_frame)
            ff_origin_slots: Dict[int, int] = {}
            for tid in self.nodes.trajectory_ids():
                traj_ff = self._fixed_frame_data.trajectory(tid)
                if not traj_ff:
                    continue
                ff_times = [t for t, _ in traj_ff]
                for nindex, node in self.nodes.trajectory(tid):
                    fix = _interpolate_fixed_frame(traj_ff, ff_times, node.time)
                    if fix is None:
                        continue
                    fix_t, fix_q, has_rotation = fix
                    fix2d = np.array([fix_t[0], fix_t[1], nquat.get_yaw(fix_q)])
                    if tid not in ff_origin_slots:
                        if tid in self.fixed_frame_origin:
                            origin = np.asarray(self.fixed_frame_origin[tid],
                                                np.float64)
                        else:
                            origin = _compose2d(node.global_pose_2d,
                                                _inverse2d(fix2d))
                        ff_origin_slots[tid] = len(sub_poses)
                        sub_poses.append(origin)
                        sub_fixed.append(False)
                    a_idx.append(ff_origin_slots[tid])
                    b_idx.append(node_slots[NodeId(tid, nindex)])
                    rels.append(fix2d)
                    tws.append(op.fixed_frame_pose_translation_weight)
                    rws.append(op.fixed_frame_pose_rotation_weight
                               if has_rotation else 0.0)
                    hubers.append(op.fixed_frame_pose_use_tolerant_loss)

            # --- landmarks: submap-side slots (couple only to nodes) ---
            # observation = landmark pose in the tracking frame of the nearest
            # node (landmark_cost_function_2d.h; nearest-node instead of the
            # reference's time interpolation between adjacent nodes). The
            # residual is expressed landmark-side: rel = landmark^-1 * node.
            landmark_slots: Dict[str, int] = {}
            for tid, data in self._landmark_observations:
                node_items = self.nodes.trajectory(tid)
                if not node_items:
                    continue
                nearest_index, nearest_node = min(
                    node_items, key=lambda kv: abs(kv[1].time - data.time))
                if abs(nearest_node.time - data.time) > 1_000_000:
                    continue
                for obs in data.landmark_observations:
                    obs2d = np.array([
                        obs.landmark_to_tracking_transform_translation[0],
                        obs.landmark_to_tracking_transform_translation[1],
                        nquat.get_yaw(obs.landmark_to_tracking_transform_rotation)])
                    if obs.id not in landmark_slots:
                        landmark_slots[obs.id] = len(sub_poses)
                        if obs.id in self.landmark_poses:
                            # Previously optimized or client-set landmark pose;
                            # frozen landmarks stay fixed anchors
                            # (optimization_problem LandmarkNode.frozen).
                            sub_poses.append(
                                np.asarray(self.landmark_poses[obs.id], float))
                            sub_fixed.append(obs.id in self._frozen_landmarks)
                        else:
                            sub_poses.append(_compose2d(
                                nearest_node.global_pose_2d, obs2d))
                            sub_fixed.append(False)
                    a_idx.append(landmark_slots[obs.id])
                    b_idx.append(node_slots[NodeId(tid, nearest_index)])
                    rels.append(_inverse2d(obs2d))
                    tws.append(obs.translation_weight)
                    rws.append(obs.rotation_weight)
                    hubers.append(False)

        finally:
            # A failed snapshot must not leak the graph lock and
            # deadlock every subsequent add_node/query (VERDICT r3 weak #5).
            self._result_lock.release()

        sub_solved, node_solved = self._solve_schur(
            sub_poses, sub_fixed, node_poses, node_fixed,
            (a_idx, b_idx, rels, tws, rws, hubers),
            (j_idx, nn_rels, nn_tws, nn_rws),
            ([], [], [], [], []),  # unary anchors unused (origin slots above)
            num_iterations)

        with self._result_lock:
            for sid, slot in submap_slots.items():
                if sid in self.submap_data:
                    self.submap_data[sid].global_pose_2d = sub_solved[slot].astype(np.float64)
            for nid, slot in node_slots.items():
                if nid in self.nodes:
                    self.nodes[nid].global_pose_2d = node_solved[slot].astype(np.float64)
            for lid, slot in landmark_slots.items():
                self.landmark_poses[lid] = sub_solved[slot].astype(np.float64)
            for tid, slot in ff_origin_slots.items():
                self.fixed_frame_origin[tid] = sub_solved[slot].astype(np.float64)
            # Extrapolate submaps/nodes appended while the solve ran: shift
            # them by the correction of their trajectory's anchor submap
            # (last optimized), new_anchor * old_anchor^-1.
            corrections = {
                tid: _compose2d(self.submap_data[sid].global_pose_2d,
                                _inverse2d(anchor_old[tid]))
                for tid, sid in tail_anchor.items() if sid in self.submap_data}
            for (tid, sindex), entry in self.submap_data.items():
                if SubmapId(tid, sindex) not in submap_slots and tid in corrections:
                    entry.global_pose_2d = _compose2d(
                        corrections[tid], entry.global_pose_2d)
            for (tid, nindex), node in self.nodes.items():
                if NodeId(tid, nindex) not in node_slots and tid in corrections:
                    node.global_pose_2d = _compose2d(
                        corrections[tid], node.global_pose_2d)
            self._num_nodes_since_last_optimization = 0
            self._run_trimmers()
        for cb in self._global_optimization_callbacks:
            cb()

    def _solve_schur(self, sub_poses, sub_fixed, node_poses, node_fixed,
                     sn_terms, nn_terms, u_terms, num_iterations):
        """Pad the partitioned problem to power-of-two buckets (bounds
        recompiles) and run the Schur GN solve on the mesh (or one device).
        Returns (sub_solved (S,3) np, node_solved (N,3) np)."""
        from cartographer_tpu.parallel.schur_spa import (
            SchurSpaProblem2D,
            solve_spa_2d_schur,
        )

        a_idx, b_idx, rels, tws, rws, hubers = sn_terms
        j_idx, nn_rels, nn_tws, nn_rws = nn_terms
        u_idx, u_rels, u_tws, u_rws, u_hubers = u_terms
        S, N = len(sub_poses), len(node_poses)
        Sp = 1 << int(np.ceil(np.log2(max(S, 2))))
        Np = 1 << int(np.ceil(np.log2(max(N, 2))))

        mesh = self._mesh
        if mesh is None:
            import jax
            from jax.sharding import Mesh
            mesh = _single_device_mesh(jax.devices()[0])
        m = mesh.devices.size

        def cap_of(n):
            c = 1 << int(np.ceil(np.log2(max(n, 16))))
            return ((c + m - 1) // m) * m

        def padi(arr, cap):
            out = np.zeros(cap, np.int32)
            out[: len(arr)] = arr
            return jnp.asarray(out)

        def padf(arr, cap, width=None):
            shape = (cap,) if width is None else (cap, width)
            out = np.zeros(shape, np.float32)
            if len(arr):
                out[: len(arr)] = arr
            return jnp.asarray(out)

        def padp(poses, fixed, cap):
            p = np.zeros((cap, 3), np.float32)
            p[: len(poses)] = poses
            f = np.ones(cap, bool)
            f[: len(fixed)] = fixed
            return jnp.asarray(p), jnp.asarray(f)

        C, D, U = len(a_idx), len(j_idx), len(u_idx)
        Cc, Dc, Uc = cap_of(C), cap_of(D), cap_of(U)
        sub_p, sub_f = padp(sub_poses, sub_fixed, Sp)
        nod_p, nod_f = padp(node_poses, node_fixed, Np)
        problem = SchurSpaProblem2D(
            submap_poses=sub_p, node_poses=nod_p,
            a_idx=padi(a_idx, Cc), b_idx=padi(b_idx, Cc),
            rel=padf(rels, Cc, 3),
            trans_weight=padf(tws, Cc), rot_weight=padf(rws, Cc),
            use_huber=jnp.asarray(
                np.pad(np.asarray(hubers, bool), (0, Cc - C))),
            valid=jnp.asarray(np.arange(Cc) < C),
            j_idx=padi(j_idx, Dc), nn_rel=padf(nn_rels, Dc, 3),
            nn_trans_weight=padf(nn_tws, Dc), nn_rot_weight=padf(nn_rws, Dc),
            nn_valid=jnp.asarray(np.arange(Dc) < D),
            submap_fixed=sub_f, node_fixed=nod_f,
            u_idx=padi(u_idx, Uc), u_rel=padf(u_rels, Uc, 3),
            u_trans_weight=padf(u_tws, Uc), u_rot_weight=padf(u_rws, Uc),
            u_huber=jnp.asarray(
                np.pad(np.asarray(u_hubers, bool), (0, Uc - U))),
            u_valid=jnp.asarray(np.arange(Uc) < U),
        )
        if self._multihost:
            # Cross-process solve: the identical host-assembled problem on
            # every process is scattered over the GLOBAL mesh (constraint
            # shards per process, poses replicated); collectives cross hosts
            # (SURVEY.md P5). cap_of() already rounds the constraint axes to
            # multiples of the global device count, so the per-process split
            # inside the multihost wrapper is exact.
            from cartographer_tpu.parallel.multihost import (
                solve_spa_2d_schur_multihost)
            sub_solved, node_solved = solve_spa_2d_schur_multihost(
                mesh, problem, num_iterations=num_iterations,
                huber_scale=self._options.optimization_problem.huber_scale)
            return np.asarray(sub_solved), np.asarray(node_solved)
        sub_solved, node_solved = solve_spa_2d_schur(
            mesh, problem, num_iterations=num_iterations,
            huber_scale=self._options.optimization_problem.huber_scale)
        return np.asarray(sub_solved), np.asarray(node_solved)

    def run_final_optimization(self) -> None:
        self.wait_for_optimization()
        self.run_optimization(self._options.max_num_final_iterations)

    # ------------------------------------------------------------ trimming

    def add_trimmer(self, trimmer) -> None:
        """PoseGraph2D::AddTrimmer; trimmers run after each optimization."""
        self._trimmers.append(trimmer)

    def _run_trimmers(self) -> None:
        for trimmer in list(self._trimmers):
            trimmer.trim(self)
            if trimmer.is_finished():
                self._trimmers.remove(trimmer)

    # -- Trimmable handle API (pose_graph_trimmer.h:28-54) -------------------

    def get_submap_ids(self, trajectory_id: int) -> List[SubmapId]:
        return [SubmapId(trajectory_id, i)
                for i, _ in self.submap_data.trajectory(trajectory_id)]

    def get_all_submap_ids(self) -> List[SubmapId]:
        return [SubmapId(t, i) for (t, i), _ in self.submap_data.items()]

    def get_submap_coverage_cells(self, submap_id: SubmapId, cell_size: float):
        """Coarse world-frame coverage cells of a finished submap's known area."""
        entry = self.submap_data.get(submap_id)
        if entry is None or entry.submap.grid is None:
            return []
        grid = entry.submap.grid
        imin, imax, jmin, jmax = grid.known_bounds_numpy()
        if imax < imin:
            return []
        origin = np.asarray(grid.origin)
        cells = set()
        step = max(1, int(cell_size / grid.resolution))
        known = np.asarray(grid.known)
        for i in range(imin, imax + 1, step):
            for j in range(jmin, jmax + 1, step):
                if known[i, j]:
                    x = origin[0] + (i + 0.5) * grid.resolution
                    y = origin[1] + (j + 0.5) * grid.resolution
                    cells.add((int(np.floor(x / cell_size)),
                               int(np.floor(y / cell_size))))
        return list(cells)

    def trim_submap(self, submap_id: SubmapId) -> None:
        """TrimSubmap (pose_graph_2d.cc via Trimmable): drop the submap, its
        constraints, and nodes left without any INTRA constraint."""
        if submap_id not in self.submap_data:
            return
        del self.submap_data[submap_id]
        self._constraint_builder.remove_submap(submap_id)
        kept = []
        nodes_still_referenced = set()
        for c in self.constraints:
            if c.submap_id == submap_id:
                continue
            kept.append(c)
            if c.tag == "INTRA_SUBMAP":
                nodes_still_referenced.add(c.node_id)
        self.constraints = kept
        for (tid, nindex), _ in list(self.nodes.items()):
            nid = NodeId(tid, nindex)
            if nid not in nodes_still_referenced:
                del self.nodes[nid]
        self.constraints = [
            c for c in self.constraints
            if c.node_id in nodes_still_referenced]

    # ------------------------------------------------------------ queries

    def set_global_slam_optimization_callback(self, cb) -> None:
        self._global_optimization_callbacks.append(cb)

    def freeze_trajectory(self, trajectory_id: int) -> None:
        self._frozen_trajectories.add(trajectory_id)
        self.trajectory_states[trajectory_id] = "FROZEN"
        self._find(trajectory_id)

    def finish_trajectory(self, trajectory_id: int) -> None:
        """PoseGraphInterface::FinishTrajectory state transition.

        Mirrors the reference's finish semantics (pose_graph_2d.cc:546+
        WaitForAllComputations): the trajectory is only observably finished
        once its pending background constraint searches and any in-flight
        solve have drained — callers querying constraints right after
        finish must see them."""
        if self.trajectory_states.get(trajectory_id) != "FROZEN":
            self.trajectory_states[trajectory_id] = "FINISHED"
        self.wait_for_all_computations()
        self.wait_for_optimization()

    def delete_trajectory(self, trajectory_id: int) -> None:
        """PoseGraph2D::DeleteTrajectory: purge the trajectory's submaps,
        nodes, constraints, and sensor streams (pose_graph_2d.cc wait-for-
        deletion semantics collapse to an immediate purge in the synchronous
        build)."""
        for sid in self.get_submap_ids(trajectory_id):
            self.trim_submap(sid)
        for (tid, nindex), _ in list(self.nodes.items()):
            if tid == trajectory_id:
                del self.nodes[NodeId(tid, nindex)]
        self.constraints = [
            c for c in self.constraints
            if (c.submap_id.trajectory_id != trajectory_id
                and c.node_id.trajectory_id != trajectory_id)]
        for store in (self._odometry_data, self._fixed_frame_data):
            try:
                store.delete_trajectory(trajectory_id)
            except (AttributeError, KeyError):
                pass
        self._landmark_observations = [
            (tid, d) for (tid, d) in self._landmark_observations
            if tid != trajectory_id]
        self.fixed_frame_origin.pop(trajectory_id, None)
        self._frozen_trajectories.discard(trajectory_id)
        self.trajectory_states[trajectory_id] = "DELETED"

    def set_landmark_pose(self, landmark_id: str, global_pose,
                          frozen: bool = False) -> None:
        """PoseGraphInterface::SetLandmarkPose; pose is (x, y, yaw)."""
        self.landmark_poses[landmark_id] = np.asarray(global_pose, np.float64)
        if frozen:
            self._frozen_landmarks.add(landmark_id)

    def get_landmark_poses(self) -> Dict[str, np.ndarray]:
        return dict(self.landmark_poses)

    def num_inter_constraints(self) -> int:
        return sum(1 for c in self.constraints if c.tag == "INTER_SUBMAP")

    def node_global_poses(self) -> Dict[NodeId, np.ndarray]:
        return {NodeId(t, i): n.global_pose_2d for (t, i), n in self.nodes.items()}

    def submap_global_poses(self) -> Dict[SubmapId, np.ndarray]:
        return {SubmapId(t, i): e.global_pose_2d for (t, i), e in self.submap_data.items()}

    def local_to_global(self, trajectory_id: int) -> np.ndarray:
        """Local SLAM frame → global frame transform for a trajectory.

        Reference pose_graph_2d.cc ComputeLocalToGlobalTransform: the last
        submap of the trajectory defines the offset
        global_submap_pose * local_submap_pose^-1; identity before any submap
        exists. Returned as a [x, y, theta] SE(2) pose.
        """
        with self._result_lock:
            last = None
            for (t, i), entry in self.submap_data.items():
                if t == trajectory_id and (last is None or i > last[0]):
                    last = (i, entry)
            if last is None:
                return np.zeros(3)
            entry = last[1]
            local = self._submap_local_pose_2d(entry.submap)
            return _compose2d(entry.global_pose_2d, _inverse2d(local))
