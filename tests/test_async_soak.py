"""Concurrency soak test for the async pose graph (VERDICT r2 item 1).

N frontend threads call PoseGraph2D.add_node concurrently (one trajectory
each — the reference's pose graph is hit concurrently by the sensor thread
and the work-queue pool, pose_graph_2d.cc:126-170) while background
constraint searches, the background optimizer cadence, a trimmer, and a
concurrent serializer all run. Asserts graph invariants afterwards:
  - no lost constraints (every node keeps its INTRA constraints, every
    constraint endpoint exists),
  - monotone node indices and times per trajectory,
  - all pending work drains at finish (WaitForAllComputations,
    pose_graph_2d.cc:546+).
The reference leans on ASAN + abseil annotations (scripts/build_test_asan.sh);
here the equivalent is hammering the locked paths from real threads.
"""

import copy
import threading

import numpy as np

from cartographer_tpu.core.config import apply_overrides, MapBuilderOptions
from cartographer_tpu.core.time import from_seconds
from cartographer_tpu.mapping.id import NodeId
from cartographer_tpu.mapping.local_trajectory_builder_2d import (
    LocalTrajectoryBuilder2D,
)
from cartographer_tpu.mapping.pose_graph_2d import PoseGraph2D, TrajectoryNode
from cartographer_tpu.sensor.data import TimedPointCloudData

from test_local_slam_2d import make_wall_points, scan_at, small_options


def _record_insertions(world, num_scans):
    """Drive one real 2D frontend and record its insertion results."""
    tb2 = small_options(**{
        "submaps.num_range_data": 4,
        "motion_filter.max_distance_meters": 0.01,
    })
    builder = LocalTrajectoryBuilder2D(tb2, ["laser"])
    records = []  # (node_fields, insertion_submaps, finished_submaps)
    t0 = 1_000_000_000
    for i in range(num_scans):
        xy = np.array([0.05 * i, 0.0])
        r = builder.add_range_data("laser", TimedPointCloudData(
            time=t0 + from_seconds(i * 0.1), origin=np.zeros(3, np.float32),
            ranges=scan_at(world, xy, 0.0),
            times=np.zeros(len(world), np.float32)))
        if r is None or r.insertion_result is None:
            continue
        ir = r.insertion_result
        records.append((
            dict(time=ir.time, gravity_alignment=ir.gravity_alignment,
                 filtered_points=np.asarray(
                     ir.filtered_gravity_aligned_point_cloud.to_numpy(),
                     np.float64),
                 local_pose_translation=ir.local_pose_translation,
                 local_pose_rotation=ir.local_pose_rotation),
            list(ir.insertion_submaps), list(ir.finished_submaps)))
    # Make sure trailing submaps count as finished so loop closure fires.
    last_finished = builder.finish()
    if records and last_finished:
        records[-1] = (records[-1][0], records[-1][1],
                       records[-1][2] + last_finished)
    return records


def test_soak_concurrent_add_optimize_trim_serialize(tmp_path):
    mb_opts = apply_overrides(
        MapBuilderOptions(use_trajectory_builder_2d=True), {
            "pose_graph.optimize_every_n_nodes": 5,  # overlap solves
            "pose_graph.constraint_builder.sampling_ratio": 1.0,
            "pose_graph.global_sampling_ratio": 1.0,
        })
    pg = PoseGraph2D(mb_opts.pose_graph, num_background_threads=3)

    world = make_wall_points(num=300, seed=3)
    base_records = _record_insertions(world, num_scans=28)
    assert len(base_records) >= 10

    num_robots = 3
    # Per-robot deep copies of the submap handles: the pose graph keys
    # submaps by object identity, so each "robot" must own distinct handles
    # (grids are shared read-only device arrays).
    robot_records = []
    for r in range(num_robots):
        mapping = {}
        recs = []
        for node_fields, submaps, finished in base_records:
            subs = []
            for s in submaps:
                if id(s) not in mapping:
                    c = copy.copy(s)
                    mapping[id(s)] = c
                subs.append(mapping[id(s)])
            fins = [mapping[id(s)] for s in finished]
            nf = dict(node_fields)
            nf["time"] = node_fields["time"] + r * 10_000_000_000
            recs.append((nf, subs, fins))
        robot_records.append(recs)

    errors = []

    def drive(robot):
        try:
            for nf, subs, fins in robot_records[robot]:
                pg.add_node(robot, TrajectoryNode(**nf), subs, fins)
        except Exception:  # noqa: BLE001
            import traceback
            errors.append(traceback.format_exc())

    stop = threading.Event()

    def serializer():
        # Concurrent state snapshots while frontends run: serialization
        # drains pending work each time, interleaving with new appends.
        from cartographer_tpu.io.pbstream import ProtoStreamWriter
        from cartographer_tpu.io.serialization import serialize_state
        k = 0
        while not stop.is_set():
            try:
                pg.wait_for_all_computations()
                w = ProtoStreamWriter(str(tmp_path / f"soak_{k % 2}.pbstream"))
                serialize_state(pg, w, include_unfinished_submaps=True)
                w.close()
            except Exception:  # noqa: BLE001
                import traceback
                errors.append(traceback.format_exc())
            k += 1

    from cartographer_tpu.mapping.trimmers import PureLocalizationTrimmer
    pg.add_trimmer(PureLocalizationTrimmer(0, max_submaps_to_keep=3))

    threads = [threading.Thread(target=drive, args=(r,))
               for r in range(num_robots)]
    ser = threading.Thread(target=serializer)
    for t in threads:
        t.start()
    ser.start()
    for t in threads:
        t.join()
    for tid in range(num_robots):
        pg.finish_trajectory(tid)
    stop.set()
    ser.join()
    assert not errors, errors

    pg.run_final_optimization()
    # Drained: no pending futures, no in-flight solve.
    assert not pg._pending_futures
    assert pg._optimization_future is None or pg._optimization_future.done()

    # Monotone node indices and times per trajectory.
    per_traj = {}
    for (tid, nindex), node in pg.nodes.items():
        per_traj.setdefault(tid, []).append((nindex, node.time))
    for tid, items in per_traj.items():
        indices = [i for i, _ in items]
        assert indices == sorted(indices)
        times = [t for _, t in items]
        assert times == sorted(times)

    # No lost constraints: every surviving node keeps an INTRA constraint
    # and every constraint endpoint exists.
    intra_nodes = {c.node_id for c in pg.constraints if c.tag == "INTRA_SUBMAP"}
    for (tid, nindex), _ in pg.nodes.items():
        assert NodeId(tid, nindex) in intra_nodes
    node_ids = {NodeId(t, i) for (t, i), _ in pg.nodes.items()}
    submap_ids = set(pg.get_all_submap_ids())
    for c in pg.constraints:
        assert c.node_id in node_ids, c
        assert c.submap_id in submap_ids, c
    # Cross-robot loop closures were found and poses are finite.
    assert pg.num_inter_constraints() > 0
    for (_, _), node in pg.nodes.items():
        assert np.all(np.isfinite(node.global_pose_2d))
    # The trimmer ran: trajectory 0 keeps at most 3 submaps.
    assert len(pg.get_submap_ids(0)) <= 3
