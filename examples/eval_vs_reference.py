"""Replay a reference-format .pbstream through this framework and score the
result against the reference's own optimized trajectory (VERDICT r2 item 6:
the real-data path — the moment a real Cartographer bag/pbstream is
available, ATE-vs-reference is this one command).

Pipeline:
  1. Load the pbstream (reference proto schema via io/carto_pbstream.py, or
     this package's native format) into a frozen pose graph.
  2. Extract every trajectory node's stored point cloud + timestamp and the
     reference-optimized global poses.
  3. Autogenerate ground-truth relations from the loaded graph's
     loop-closure constraints (ground_truth/autogenerate_ground_truth.cc
     method) — the reference's own accuracy harness.
  4. Replay the node clouds through a fresh MapBuilder (this framework's
     full 2D pipeline: fused frontend + batched loop closure + Schur SPA).
  5. Report ATE of our trajectory against the reference-optimized one
     (Umeyama-aligned) and the relation metrics of our trajectory against
     the reference-derived relations.

Usage: python examples/eval_vs_reference.py state.pbstream [--cpu]
       [--min-covered 50] [--scan-hz 10]
Prints a JSON summary.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def umeyama_2d(src: np.ndarray, dst: np.ndarray):
    """Least-squares rigid (no scale) alignment src -> dst, both (N, 2)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    cov = (dst - mu_d).T @ (src - mu_s) / len(src)
    u, _, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(u @ vt))
    R = u @ np.diag([1.0, d]) @ vt
    t = mu_d - R @ mu_s
    return R, t


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("pbstream")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--min-covered", type=float, default=50.0,
                        help="min covered distance for GT relations [m]")
    parser.add_argument("--max-nodes", type=int, default=0,
                        help="replay only the first N nodes (0 = all)")
    parser.add_argument("--min-score", type=float, default=0.42,
                        help="loop-closure acceptance score: replayed node "
                             "clouds are the ~100-point loop-closure-filtered "
                             "scans, which score lower against the equally "
                             "sparse replay grids than raw scans do")
    parser.add_argument("--dump", default="",
                        help="write per-node aligned errors + relation "
                             "details to this JSON file (tail diagnosis)")
    parser.add_argument("--no-stored-odometry", action="store_true",
                        help="frontend mode: replay scans only. By default "
                             "the stream's stored per-node local poses are "
                             "fed as odometry — without a motion prior the "
                             "first handful of scans match against a "
                             "near-empty bootstrap grid and bake a ~0.3 m "
                             "transient into the trajectory start (the r4 "
                             "'35 cm tail': nodes 0-5 of 320)")
    parser.add_argument("--replay-mode", default="local-results",
                        choices=["local-results", "frontend"],
                        help="local-results (default): feed the stream's "
                             "(cloud, local pose, submap grid) records "
                             "through the uplink LocalSlamResultData path — "
                             "the reference's own tier-2 replay semantics — "
                             "so the eval scores the BACKEND (loop closure "
                             "+ SPA de-drifting the stored chain). "
                             "frontend: re-scan-match the stored clouds "
                             "from scratch; NOTE a cloud-only replay "
                             "under-constrains yaw scan-to-scan (stored "
                             "node clouds are sparse re-sampled wall hits) "
                             "— position metrics remain valid, yaw is not "
                             "identifiable in this mode")
    args = parser.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    from cartographer_tpu.core.config import (
        MapBuilderOptions,
        TrajectoryBuilderOptions,
        apply_overrides,
    )
    from cartographer_tpu.ground_truth import (
        autogenerate_ground_truth,
        compute_relations_metrics,
    )
    from cartographer_tpu.mapping.map_builder import MapBuilder
    from cartographer_tpu.sensor.data import TimedPointCloudData
    from cartographer_tpu.transform import nquat
    from cartographer_tpu.transform.interpolation import (
        TransformInterpolationBuffer,
    )

    # 1-2. Load the reference state.
    ref_mb = MapBuilder(MapBuilderOptions(use_trajectory_builder_2d=True))
    ref_mb.load_state(args.pbstream, load_frozen_state=True)
    ref_pg = ref_mb.pose_graph
    nodes = sorted(((tid, ni), n) for (tid, ni), n in ref_pg.nodes.items())
    if args.max_nodes:
        nodes = nodes[: args.max_nodes]
    if not nodes:
        raise SystemExit("no trajectory nodes in the stream")

    # 3. Reference-derived ground-truth relations.
    relations = autogenerate_ground_truth(
        ref_pg, min_covered_distance=args.min_covered,
        outlier_threshold_meters=0.15, outlier_threshold_radians=0.02)

    # 4. Replay node clouds through a fresh pipeline. Node clouds are the
    # loop-closure-filtered gravity-aligned scans the reference stored
    # (~100-200 points); scan capacity and filters sized accordingly.
    tb2 = apply_overrides(TrajectoryBuilderOptions().trajectory_builder_2d, {
        "use_imu_data": False,
        "use_online_correlative_scan_matching": True,
        "max_range": 30.0,
        "min_range": 0.0,
        "voxel_filter_size": 0.025,
        "submaps.num_range_data": 35,
        "adaptive_voxel_filter.min_num_points": 100,
        "adaptive_voxel_filter.max_length": 0.5,
        "motion_filter.max_distance_meters": 0.05,
        "motion_filter.max_angle_radians": math.radians(0.7),
        "tpu.scan_capacity": 2048,
        "tpu.submap_grid_size": 512,
        "real_time_correlative_scan_matcher.linear_search_window": 0.2,
    })
    traj = TrajectoryBuilderOptions(trajectory_builder_2d=tb2)
    mb_opts = apply_overrides(MapBuilderOptions(use_trajectory_builder_2d=True), {
        "pose_graph.optimize_every_n_nodes": 40,
        # Replayed node clouds are the loop-closure-filtered ~100-point
        # scans: sparser grids score lower than raw-scan grids, so the
        # acceptance threshold comes down with them.
        "pose_graph.constraint_builder.sampling_ratio": 1.0,
        "pose_graph.constraint_builder.min_score": args.min_score,
        "pose_graph.constraint_builder.max_constraint_distance": 15.0,
    })
    mb = MapBuilder(mb_opts)
    if args.replay_mode == "local-results":
        # The reference's tier-2 semantics (cloud/internal/handlers/
        # add_local_slam_result_data + SubmapController): each stream node
        # becomes a LocalSlamResultData carrying its cloud + stored local
        # pose, with the stream's submap grids attached when a submap
        # finishes. The pose graph then runs the REAL global SLAM work —
        # loop closure against the stored grids and the Schur SPA —
        # de-drifting the stored chain.
        from cartographer_tpu.io.serialization import grid2d_record
        from cartographer_tpu.mapping.id import NodeId, SubmapId
        from cartographer_tpu.mapping.local_slam_result_data import (
            LocalSlamResultData,
            SubmapRecord,
        )

        # Node -> its intra submap(s), from the stream's own constraints.
        intra = {}
        for c in ref_pg.constraints:
            if c.tag == "INTRA_SUBMAP":
                intra.setdefault(c.node_id, []).append(c.submap_id)
        # Last node of each submap = the record that carries its grid.
        submap_last = {}
        for key, _ in nodes:
            for sid in intra.get(NodeId(*key), []):
                submap_last[sid] = key

        tid = mb.add_trajectory_builder(
            ["local_slam_result_0"], traj, local_slam_results=True)
        counts = {}
        for key, node in nodes:
            sids = intra.get(NodeId(*key), [])
            if not sids:
                continue
            records = []
            for sid in sorted(sids, key=lambda s: s.submap_index):
                counts[sid] = counts.get(sid, 0) + 1
                entry = ref_pg.submap_data.get(
                    SubmapId(0, sid.submap_index))
                finished = (submap_last[sid] == key
                            and entry is not None
                            and entry.submap.grid is not None)
                rec = SubmapRecord(
                    trajectory_id=0, submap_index=sid.submap_index,
                    local_pose_translation=np.asarray(
                        entry.submap.local_pose_translation, np.float64),
                    local_pose_rotation=np.asarray(
                        entry.submap.local_pose_rotation, np.float64),
                    num_range_data=counts[sid],
                    insertion_finished=finished,
                    grid=grid2d_record(entry.submap.grid) if finished
                    else None)
                records.append(rec)
            pts = np.asarray(node.filtered_points, np.float64)
            mb.add_sensor_data(tid, "local_slam_result_0", LocalSlamResultData(
                time=int(node.time),
                node={
                    "time": int(node.time),
                    "gravity_alignment": np.asarray(
                        node.gravity_alignment, np.float64),
                    "filtered_points": pts,
                    "local_pose_translation": np.asarray(
                        node.local_pose_translation, np.float64),
                    "local_pose_rotation": np.asarray(
                        node.local_pose_rotation, np.float64),
                },
                submaps=records, is_3d=False))
        mb.finish_trajectory(tid)
    else:
        use_odom = not args.no_stored_odometry
        sensors = ["laser"] + (["odom"] if use_odom else [])
        tid = mb.add_trajectory_builder(sensors, traj)
        from cartographer_tpu.sensor.data import OdometryData
        for (t_id, ni), node in nodes:
            pts = np.asarray(node.filtered_points, np.float32)
            if pts.size == 0:
                continue
            if pts.shape[1] == 2:
                pts = np.concatenate(
                    [pts, np.zeros((len(pts), 1), np.float32)], axis=1)
            if use_odom:
                # The stream's stored per-node local pose IS the reference
                # frontend's own odometry-grade chain (trajectory_node.h
                # local_pose); feeding it as odometry gives the replay the
                # motion prior a live system has, so the bootstrap scans
                # don't wander on a near-empty grid.
                mb.add_sensor_data(tid, "odom", OdometryData(
                    time=int(node.time) - 1,
                    pose_translation=np.asarray(
                        node.local_pose_translation, np.float64),
                    pose_rotation=np.asarray(
                        node.local_pose_rotation, np.float64)))
            mb.add_sensor_data(tid, "laser", TimedPointCloudData(
                time=int(node.time), origin=np.zeros(3, np.float32),
                ranges=pts, times=np.zeros(len(pts), np.float32)))
        mb.finish_trajectory(tid)
    mb.pose_graph.run_final_optimization()
    pg = mb.pose_graph

    # 5. Score.
    ours, refs = [], []
    buf = TransformInterpolationBuffer()
    ref_by_time = {n.time: n for _, n in nodes}
    for (t_id, ni), node in pg.nodes.items():
        ref_node = ref_by_time.get(node.time)
        if ref_node is None:
            continue
        ours.append(node.global_pose_2d[:2])
        refs.append(ref_node.global_pose_2d[:2])
        # theta is relative to the gravity-aligned frame; compose with the
        # node's gravity alignment for the full rotation.
        buf.push(node.time, np.array([*node.global_pose_2d[:2], 0.0]),
                 nquat.normalize(nquat.multiply(
                     nquat.from_yaw(node.global_pose_2d[2]),
                     node.gravity_alignment)))
    ours = np.asarray(ours)
    refs = np.asarray(refs)
    R, t = umeyama_2d(ours, refs)
    aligned = ours @ R.T + t
    ate = np.linalg.norm(aligned - refs, axis=1)

    # Relation metric, TRANSLATION-ONLY in the aligned global frame: the
    # stored node clouds are gravity-aligned (trajectory_node.h), so the
    # replayed trajectory carries no meaningful per-node heading — the
    # node-frame Burgard rotation comparison is undefined for a
    # cloud-replay; real raw-sensor runs get the full metric from
    # compute_relations_metrics.
    aligned_by_time = {}
    k = 0
    for (t_id, ni), node in pg.nodes.items():
        if node.time in ref_by_time:
            aligned_by_time[node.time] = aligned[k]
            k += 1
    rel_errs = []
    for r in relations:
        a = aligned_by_time.get(r.time1)
        b = aligned_by_time.get(r.time2)
        ra = ref_by_time.get(r.time1)
        rb = ref_by_time.get(r.time2)
        if a is None or b is None or ra is None or rb is None:
            continue
        d_ours = b - a
        d_ref = rb.global_pose_2d[:2] - ra.global_pose_2d[:2]
        rel_errs.append(np.linalg.norm(d_ours - d_ref))
    rel_errs = np.asarray(rel_errs) if rel_errs else np.zeros(0)

    if args.dump:
        order = sorted(aligned_by_time)
        per_node = [{"time": int(tm),
                     "err": float(np.linalg.norm(
                         aligned_by_time[tm] - ref_by_time[tm].global_pose_2d[:2])),
                     "ours": [float(x) for x in aligned_by_time[tm]],
                     "ref": [float(x) for x in ref_by_time[tm].global_pose_2d[:2]]}
                    for tm in order]
        rel_detail = []
        for r in relations:
            a = aligned_by_time.get(r.time1)
            b = aligned_by_time.get(r.time2)
            ra = ref_by_time.get(r.time1)
            rb = ref_by_time.get(r.time2)
            if a is None or b is None or ra is None or rb is None:
                continue
            rel_detail.append({
                "time1": int(r.time1), "time2": int(r.time2),
                "err": float(np.linalg.norm(
                    (b - a) - (rb.global_pose_2d[:2] - ra.global_pose_2d[:2])))})
        with open(args.dump, "w") as f:
            json.dump({"per_node": per_node, "relations": rel_detail}, f)

    print(json.dumps({
        "pbstream": os.path.basename(args.pbstream),
        "reference_nodes": len(nodes),
        "replayed_nodes": len(pg.nodes),
        "inter_constraints": pg.num_inter_constraints(),
        "ate_vs_reference_mean_m": round(float(ate.mean()), 4),
        "ate_vs_reference_max_m": round(float(ate.max()), 4),
        "relation_trans_err_mean_m": (
            round(float(rel_errs.mean()), 4) if len(rel_errs) else None),
        "num_relations": int(len(rel_errs)),
    }))


if __name__ == "__main__":
    main()
