"""End-to-end accuracy evaluation on a synthetic multi-room world.

A Deutsches-Museum-style exercise without the bag file: a robot drives a
long loop through a multi-room floor plan, local SLAM accumulates drift
(odometry-free), loop closure corrects it, and the trajectory error is
scored with the relation metric tooling (ground_truth/) plus absolute
trajectory error against the simulator ground truth.

Run: python examples/synthetic_museum_eval.py [--scans N] [--cpu]
Prints a JSON summary.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_world(rng) -> np.ndarray:
    """Wall points of a 3-room floor plan with doorways."""
    segments = [
        # Outer walls of a 20 x 12 building.
        ((-10, -6), (10, -6)), ((10, -6), (10, 6)),
        ((10, 6), (-10, 6)), ((-10, 6), (-10, -6)),
        # Room dividers with door gaps.
        ((-3, -6), (-3, -1)), ((-3, 1.5), (-3, 6)),
        ((4, -6), (4, -2.5)), ((4, 0), (4, 6)),
        # Furniture-ish clutter.
        ((-7, -2), (-5, -2)), ((6, 2), (8, 2)), ((0, 3), (2, 3)),
    ]
    # Distinctive angled clutter: long straight walls alone make loop
    # closure locally ambiguous (aperture problem) for any correlative
    # matcher; real buildings have distinguishing structure.
    clutter_rng = np.random.RandomState(7)
    for _ in range(24):
        cx = clutter_rng.uniform(-9, 9)
        cy = clutter_rng.uniform(-5, 5)
        ang = clutter_rng.uniform(0, math.pi)
        L = clutter_rng.uniform(0.4, 1.2)
        segments.append(((cx, cy), (cx + L * math.cos(ang), cy + L * math.sin(ang))))
    pts = []
    for (x0, y0), (x1, y1) in segments:
        length = math.hypot(x1 - x0, y1 - y0)
        n = max(8, int(length / 0.04))
        t = rng.uniform(0, 1, n)
        pts.append(np.stack([
            x0 + t * (x1 - x0) + 0.013 + 0.01 * rng.randn(n),
            y0 + t * (y1 - y0) + 0.007 + 0.01 * rng.randn(n),
        ], -1))
    return np.concatenate(pts).astype(np.float32)


def visible_scan(world, pose_t, yaw, max_range=12.0, beams=720):
    """Raycast-free visibility approximation: keep wall points within range
    and not occluded (nearest point per angular bin)."""
    rel = world - pose_t[None, :]
    r = np.linalg.norm(rel, axis=1)
    theta = np.arctan2(rel[:, 1], rel[:, 0])
    bins = ((theta + np.pi) / (2 * np.pi) * beams).astype(int) % beams
    nearest = np.full(beams, np.inf)
    np.minimum.at(nearest, bins, r)
    keep = (r <= max_range) & (r <= nearest[bins] + 0.2)
    sel = rel[keep]
    c, s = np.cos(-yaw), np.sin(-yaw)
    out = np.stack([c * sel[:, 0] - s * sel[:, 1],
                    s * sel[:, 0] + c * sel[:, 1],
                    np.full(keep.sum(), 0.3, np.float32)], -1)
    return out.astype(np.float32)


def loop_trajectory(num_scans):
    """A big loop visiting all rooms and returning to the start."""
    waypoints = [(-7, -3), (-7, 3), (0, 4), (7, 3.5), (7, -3), (0, -4), (-7, -3)]
    # Resample to equal arc length, with heading along the path.
    pts = np.asarray(waypoints, float)
    seglen = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    total = seglen.sum()
    ds = total / num_scans
    poses = []
    for i in range(num_scans):
        d = i * ds
        acc = 0.0
        for k, L in enumerate(seglen):
            if d <= acc + L:
                f = (d - acc) / L
                p = pts[k] + f * (pts[k + 1] - pts[k])
                heading = math.atan2(*(pts[k + 1] - pts[k])[::-1])
                poses.append((p, heading))
                break
            acc += L
    # Smooth headings (avoid instantaneous turns).
    yaws = np.unwrap([y for _, y in poses])
    smooth = np.convolve(yaws, np.ones(9) / 9, mode="same")
    return [(p, y) for (p, _), y in zip(poses, smooth)]


def main():
    parser = argparse.ArgumentParser()
    # ~6 cm inter-scan motion; fewer scans stretch the same 42 m loop into
    # steps the frontend cannot track (>=500 needed for loop closure).
    parser.add_argument("--scans", type=int, default=700)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--save-pbstream", default="",
                        help="also serialize the optimized state (reference "
                             "carto format) — feed it to "
                             "examples/eval_vs_reference.py")
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
    from cartographer_tpu.core.time import from_seconds
    from cartographer_tpu.ground_truth import (
        autogenerate_ground_truth,
        compute_relations_metrics,
    )
    from cartographer_tpu.mapping.map_builder import MapBuilder
    from cartographer_tpu.sensor.data import TimedPointCloudData
    from cartographer_tpu.transform import nquat
    from cartographer_tpu.transform.interpolation import TransformInterpolationBuffer

    rng = np.random.RandomState(0)
    world = build_world(rng)
    poses = loop_trajectory(args.scans)

    tb2 = apply_overrides(TrajectoryBuilderOptions().trajectory_builder_2d, {
        "use_imu_data": False,
        "use_online_correlative_scan_matching": True,
        "max_range": 12.0,
        "submaps.num_range_data": 20,
        "adaptive_voxel_filter.min_num_points": 150,
        "motion_filter.max_distance_meters": 0.05,
        "motion_filter.max_angle_radians": math.radians(0.5),
        "tpu.scan_capacity": 1024,
        "tpu.submap_grid_size": 512,
        "real_time_correlative_scan_matcher.linear_search_window": 0.15,
    })
    traj = TrajectoryBuilderOptions(trajectory_builder_2d=tb2)
    mb_opts = apply_overrides(MapBuilderOptions(use_trajectory_builder_2d=True), {
        "pose_graph.optimize_every_n_nodes": 40,
        "pose_graph.constraint_builder.sampling_ratio": 0.25,
        "pose_graph.constraint_builder.min_score": 0.62,
        "pose_graph.constraint_builder.max_constraint_distance": 10.0,
        "pose_graph.constraint_builder.fast_correlative_scan_matcher.linear_search_window": 4.0,
        "pose_graph.constraint_builder.fast_correlative_scan_matcher.branch_and_bound_depth": 6,
        "pose_graph.constraint_builder.fast_correlative_scan_matcher.max_scan_range": 12.0,
    })
    mb = MapBuilder(mb_opts)
    tid = mb.add_trajectory_builder(["laser"], traj)

    t0 = 1_000_000_000
    start = time.perf_counter()
    for i, (p, yaw) in enumerate(poses):
        scan = visible_scan(world, p, yaw)
        mb.add_sensor_data(tid, "laser", TimedPointCloudData(
            time=t0 + from_seconds(i * 0.1), origin=np.zeros(3, np.float32),
            ranges=scan, times=np.zeros(len(scan), np.float32)))
    mb.finish_trajectory(tid)
    mb.pose_graph.run_final_optimization()
    wall = time.perf_counter() - start
    if args.save_pbstream:
        mb.serialize_state(args.save_pbstream, format="carto")

    pg = mb.pose_graph
    # Ground truth into the SLAM frame: the map's local frame is anchored at
    # the first scan pose (identity), so gt poses must be expressed relative
    # to the trajectory start.
    p0, yaw0 = poses[0]
    c0, s0 = math.cos(-yaw0), math.sin(-yaw0)

    def gt_local(gi):
        d = poses[gi][0] - p0
        return np.array([c0 * d[0] - s0 * d[1], s0 * d[0] + c0 * d[1]])

    errs = []
    buf = TransformInterpolationBuffer()
    node_gi = []
    for (tt, ni), node in pg.nodes.items():
        gi = round((node.time - t0) / 100_000)
        node_gi.append((node.time, gi))
        errs.append(np.linalg.norm(node.global_pose_2d[:2] - gt_local(gi)))
        # Full node rotation = Embed3D(theta) * gravity_alignment: theta is
        # yaw RELATIVE to the gravity-aligned frame (Project2D(pose * g^-1),
        # local_trajectory_builder_2d.cc:93-99), not the robot heading.
        buf.push(node.time, np.array([*node.global_pose_2d[:2], 0.0]),
                 nquat.normalize(nquat.multiply(
                     nquat.from_yaw(node.global_pose_2d[2]),
                     node.gravity_alignment)))

    # Relation metric against SIMULATOR ground truth (scoring our trajectory
    # against relations from a trusted source, as the reference harness
    # does); the loop-closure-autogenerated path also runs for parity.
    from cartographer_tpu.ground_truth import GroundTruthRelation
    relations = []
    rng2 = np.random.RandomState(1)
    arc = np.concatenate([[0], np.cumsum([
        np.linalg.norm(poses[k + 1][0] - poses[k][0])
        for k in range(len(poses) - 1)])])
    for _ in range(300):
        a, b = rng2.randint(0, len(node_gi), 2)
        (ta, ga), (tb2, gb) = node_gi[a], node_gi[b]
        if abs(arc[ga] - arc[gb]) < 10.0:
            continue
        qa = nquat.from_yaw(poses[ga][1] - yaw0)
        qb = nquat.from_yaw(poses[gb][1] - yaw0)
        iqa = nquat.conjugate(qa)
        d = gt_local(gb) - gt_local(ga)
        relations.append(GroundTruthRelation(
            time1=ta, time2=tb2,
            expected_translation=nquat.rotate(iqa, np.array([d[0], d[1], 0.0])),
            expected_rotation=nquat.multiply(iqa, qb),
            covered_distance=abs(arc[ga] - arc[gb])))
    rel_metrics = compute_relations_metrics(relations, buf)
    auto_relations = autogenerate_ground_truth(
        pg, min_covered_distance=10.0, outlier_threshold_meters=0.3,
        outlier_threshold_radians=0.05)

    print(json.dumps({
        "scans": len(poses),
        "nodes": len(pg.nodes),
        "submaps": len(pg.submap_data),
        "inter_constraints": pg.num_inter_constraints(),
        "ate_mean_m": round(float(np.mean(errs)), 4),
        "ate_max_m": round(float(np.max(errs)), 4),
        "relations": rel_metrics.num_relations,
        "relation_trans_error_m": round(rel_metrics.abs_translational_error_mean, 4),
        "relation_rot_error_deg": round(
            math.degrees(rel_metrics.abs_rotational_error_mean), 4),
        "autogenerated_relations": len(auto_relations),
        "wall_seconds": round(wall, 1),
        "scans_per_sec": round(len(poses) / wall, 1),
    }, indent=2))


if __name__ == "__main__":
    main()
