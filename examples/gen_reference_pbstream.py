"""Generate a .pbstream with the REFERENCE'S OWN serialization schema.

VERDICT r3 item 10: produce an eval input that was NOT serialized by this
repo's codec. This tool protoc-compiles the reference's .proto files
(/root/reference/cartographer/**/*.proto) and serializes every record with
the OFFICIAL Google protobuf runtime — this repo's hand-rolled proto codec
(io/proto_wire.py) is never touched on the write side. The stream framing
follows io/proto_stream.cc exactly: the 8-byte magic 0x7b1d1f7b5bf501db,
then [uint64 LE size][gzip bytes] per record; record order follows
io/internal/mapping_state_serialization.cc (SerializationHeader,
PoseGraph, AllTrajectoryBuilderOptions, Submap*, Node*).

Content is a synthetic loop trajectory over a wall world (no real bag can
enter this environment); the only repo code used for CONTENT is the
reference-format point-cloud compressor (sensor/compression.py, verified
against the reference wire format in tests/test_sensor.py), since
TrajectoryNodeData stores CompressedPointCloud.

Usage: python examples/gen_reference_pbstream.py out.pbstream [--nodes 60]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import os
import struct
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REFERENCE_ROOT = "/root/reference"
MAGIC = 0x7B1D1F7B5BF501DB

# Reference grid encoding constants (probability_values.h).
_MIN_COST = 0.1
_MAX_COST = 0.9


def compile_reference_protos(out_dir: str) -> None:
    """protoc --python_out over the reference's full proto closure."""
    protos = glob.glob(os.path.join(
        REFERENCE_ROOT, "cartographer", "**", "*.proto"), recursive=True)
    assert protos, "no reference .proto files found"
    subprocess.run(
        ["protoc", f"-I{REFERENCE_ROOT}", f"--python_out={out_dir}",
         *protos], check=True)


class StreamWriter:
    """io/proto_stream.cc framing: magic, then per record
    [uint64 LE compressed size][gzip data]."""

    def __init__(self, path: str):
        self._f = open(path, "wb")
        self._f.write(struct.pack("<Q", MAGIC))

    def write(self, message) -> None:
        data = gzip.compress(message.SerializeToString())
        self._f.write(struct.pack("<Q", len(data)))
        self._f.write(data)

    def close(self) -> None:
        self._f.close()


# Room geometry: a 14 x 10 rectangle with one circular pillar (breaks the
# rotational symmetry so loop closures are unambiguous).
_WALLS = [((-7.0, -5.0), (7.0, -5.0)), ((7.0, -5.0), (7.0, 5.0)),
          ((7.0, 5.0), (-7.0, 5.0)), ((-7.0, 5.0), (-7.0, -5.0))]
_PILLAR_C = np.array([2.0, -1.0])
_PILLAR_R = 1.5


def _make_world(rng) -> np.ndarray:
    """Dense boundary samples (for submap-grid rasterization only)."""
    per = 3000
    t = rng.rand(per)
    walls = []
    for (a, b) in _WALLS:
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        walls.append(a[None, :] + t[:, None] * (b - a)[None, :])
    ang = 2 * np.pi * rng.rand(per)
    pillar = _PILLAR_C[None, :] + _PILLAR_R * np.stack(
        [np.cos(ang), np.sin(ang)], -1)
    return np.concatenate(walls + [pillar]).astype(np.float64)


def _scan(world, pose, rng, bins=1080, max_range=16.0):
    """ANALYTIC raycast in the gravity-aligned tracking frame at `pose` =
    [x, y, yaw]: first intersection per beam with the wall segments /
    pillar circle (exact LiDAR geometry, continuous surfaces), with small
    range noise."""
    del world  # grids rasterize from samples; scans raycast analytically
    o = pose[:2]
    angles = pose[2] + 2 * np.pi * np.arange(bins) / bins
    dirs = np.stack([np.cos(angles), np.sin(angles)], -1)  # (B, 2)
    ranges = np.full(bins, np.inf)
    for (a, b) in _WALLS:
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        e = b - a
        # Solve o + t*dir = a + u*e for each beam.
        denom = dirs[:, 0] * (-e[1]) - dirs[:, 1] * (-e[0])
        rel = a - o
        tt = (rel[0] * (-e[1]) - rel[1] * (-e[0])) / np.where(
            np.abs(denom) < 1e-12, np.inf, denom)
        uu = (dirs[:, 0] * rel[1] - dirs[:, 1] * rel[0]) / np.where(
            np.abs(denom) < 1e-12, np.inf, denom)
        hit = (tt > 0.05) & (uu >= 0.0) & (uu <= 1.0)
        ranges = np.where(hit, np.minimum(ranges, tt), ranges)
    # Pillar: |o + t*dir - c| = R.
    rel = o - _PILLAR_C
    bq = 2 * np.sum(dirs * rel[None, :], axis=1)
    cq = np.sum(rel * rel) - _PILLAR_R**2
    disc = bq * bq - 4 * cq
    root = np.sqrt(np.maximum(disc, 0.0))
    t1 = (-bq - root) / 2.0
    hit = (disc > 0) & (t1 > 0.05)
    ranges = np.where(hit, np.minimum(ranges, t1), ranges)

    keep = np.isfinite(ranges) & (ranges <= max_range)
    # Reference-realistic LiDAR: 1080 beams/rev, ~1 cm range noise (Hokuyo
    # UTM-30LX class, the Deutsches Museum sensor). The earlier 360-beam /
    # 0.2%-multiplicative content under-constrained joint (t, yaw) scan
    # matching at 5 cm cells: a rotation-only optimum scored as well as the
    # true pose, freezing the replayed chain's yaw (r5 root-cause of the
    # r4 '35 cm tail' + the odometry-residual blowup it masked).
    r = ranges[keep] + 0.01 * rng.randn(int(keep.sum()))
    beam = angles[keep] - pose[2]  # tracking frame
    return np.stack([r * np.cos(beam), r * np.sin(beam)], -1)


def _rasterize_grid(world, center, rng, size=240, res=0.05):
    """uint16 correspondence-cost cells of the world near `center`, in the
    reference's cell layout (x-major rows, both axes reversed)."""
    origin = np.asarray(center, np.float64) - 0.5 * size * res
    cells = np.floor((world - origin[None, :]) / res).astype(np.int64)
    ok = np.all((cells >= 0) & (cells < size), axis=1)
    values = np.zeros((size, size), np.int32)  # 0 = unknown
    p_hit = 0.9
    cost = np.clip(1.0 - p_hit, _MIN_COST, _MAX_COST)
    v = int(round((cost - _MIN_COST) * 32766.0 / (_MAX_COST - _MIN_COST))) + 1
    values[cells[ok, 0], cells[ok, 1]] = v
    ref = values[::-1, ::-1]
    max_xy = origin + size * res
    return ref, origin, float(max_xy[0]), float(max_xy[1])


def generate(path: str, num_nodes: int = 60, seed: int = 7,
             loops: int = 1) -> dict:
    tmp = tempfile.mkdtemp(prefix="carto_protos_")
    compile_reference_protos(tmp)
    sys.path.insert(0, tmp)
    from cartographer.mapping.proto import serialization_pb2 as ser
    from cartographer.mapping.proto import pose_graph_pb2 as pgp

    from cartographer_tpu.sensor.compression import to_carto_point_data

    rng = np.random.RandomState(seed)
    world = _make_world(rng)

    # Ground-truth loop: a smooth ellipse revisiting the start (constant
    # curvature keeps the constant-velocity extrapolator honest).
    # Per-node motion stays under a scan-matching-only replayer's
    # correlative search window (~0.2 m): circumference*loops/num_nodes.
    gt = np.zeros((num_nodes, 3))
    th = loops * 2 * np.pi * np.arange(num_nodes) / num_nodes
    a, b = 2.8, 1.6
    gt[:, 0] = a * np.cos(th)
    gt[:, 1] = b * np.sin(th)
    gt[:, 2] = np.arctan2(b * np.cos(th), -a * np.sin(th))

    # Drifted local chain (what the frontend would have produced).
    drift = np.cumsum(rng.randn(num_nodes, 3) * [0.01, 0.01, 0.002], axis=0)
    local = gt + drift

    num_range_data = 10
    submap_ids = list(range(0, num_nodes, num_range_data))
    t0 = 1_600_000_000_000_000  # ticks (0.1 us), arbitrary epoch

    def rigid(msg, pose):
        msg.translation.x, msg.translation.y, msg.translation.z = (
            float(pose[0]), float(pose[1]), 0.0)
        half = 0.5 * float(pose[2])
        msg.rotation.w, msg.rotation.z = np.cos(half), np.sin(half)
        msg.rotation.x = msg.rotation.y = 0.0

    def rel_pose(a, b):
        c, s = np.cos(a[2]), np.sin(a[2])
        d = b[:2] - a[:2]
        return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1],
                         b[2] - a[2]])

    writer = StreamWriter(path)
    header = ser.SerializationHeader()
    header.format_version = 2
    writer.write(header)

    # --- PoseGraph record ---------------------------------------------------
    pg = ser.SerializedData()
    graph = pg.pose_graph
    traj = graph.trajectory.add()
    traj.trajectory_id = 0
    for si, first in enumerate(submap_ids):
        sm = traj.submap.add()
        sm.submap_index = si
        rigid(sm.pose, gt[first])  # optimized submap pose
    for i in range(num_nodes):
        nd = traj.node.add()
        nd.node_index = i
        nd.timestamp = t0 + i * 1_000_000
        rigid(nd.pose, gt[i])  # optimized ("reference") node pose
    n_inter = 0
    for i in range(num_nodes):
        si = min(i // num_range_data, len(submap_ids) - 1)
        con = graph.constraint.add()
        con.submap_id.trajectory_id = 0
        con.submap_id.submap_index = si
        con.node_id.trajectory_id = 0
        con.node_id.node_index = i
        # INTRA from the LOCAL (drifted) chain — what insertion recorded.
        rigid(con.relative_pose,
              rel_pose(local[submap_ids[si]], local[i]))
        con.translation_weight = 1e5
        con.rotation_weight = 1e5
        con.tag = pgp.PoseGraph.Constraint.INTRA_SUBMAP
    # INTER loop closures: the closing nodes against submap 0, TRUE poses.
    for i in range(num_nodes - 8, num_nodes):
        con = graph.constraint.add()
        con.submap_id.trajectory_id = 0
        con.submap_id.submap_index = 0
        con.node_id.trajectory_id = 0
        con.node_id.node_index = i
        rigid(con.relative_pose, rel_pose(gt[submap_ids[0]], gt[i]))
        con.translation_weight = 1.1e4
        con.rotation_weight = 1.1e5
        con.tag = pgp.PoseGraph.Constraint.INTER_SUBMAP
        n_inter += 1
    writer.write(pg)

    opts = ser.SerializedData()
    opts.all_trajectory_builder_options.options_with_sensor_ids.add()
    writer.write(opts)

    # --- Submap records -----------------------------------------------------
    for si, first in enumerate(submap_ids):
        sd = ser.SerializedData()
        sub = sd.submap
        sub.submap_id.trajectory_id = 0
        sub.submap_id.submap_index = si
        s2 = sub.submap_2d
        rigid(s2.local_pose, local[first])
        s2.num_range_data = num_range_data
        s2.finished = True
        cells, origin, max_x, max_y = _rasterize_grid(
            world, gt[first][:2], rng)
        g = s2.grid
        g.limits.resolution = 0.05
        g.limits.max.x = max_x
        g.limits.max.y = max_y
        g.limits.cell_limits.num_x_cells = cells.shape[1]
        g.limits.cell_limits.num_y_cells = cells.shape[0]
        g.cells.extend(cells.reshape(-1).tolist())
        nz = np.nonzero(cells)
        g.known_cells_box.min_y = int(nz[0].min())
        g.known_cells_box.max_y = int(nz[0].max())
        g.known_cells_box.min_x = int(nz[1].min())
        g.known_cells_box.max_x = int(nz[1].max())
        g.probability_grid_2d.SetInParent()
        g.min_correspondence_cost = _MIN_COST
        g.max_correspondence_cost = _MAX_COST
        writer.write(sd)

    # --- Node records -------------------------------------------------------
    clouds = []
    for i in range(num_nodes):
        sd = ser.SerializedData()
        node = sd.node
        node.node_id.trajectory_id = 0
        node.node_id.node_index = i
        nd = node.node_data
        nd.timestamp = t0 + i * 1_000_000
        nd.gravity_alignment.w = 1.0
        cloud2 = _scan(world, gt[i], rng)
        cloud3 = np.concatenate(
            [cloud2, np.zeros((len(cloud2), 1))], axis=1)
        point_data = to_carto_point_data(cloud3)
        nd.filtered_gravity_aligned_point_cloud.num_points = len(cloud3)
        nd.filtered_gravity_aligned_point_cloud.point_data.extend(
            point_data.tolist())
        rigid(nd.local_pose, local[i])
        writer.write(sd)
        clouds.append(cloud2)

    writer.close()
    return {"num_nodes": num_nodes, "num_submaps": len(submap_ids),
            "num_inter": n_inter, "gt": gt, "clouds": clouds}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--nodes", type=int, default=60)
    ap.add_argument("--loops", type=int, default=1)
    args = ap.parse_args()
    info = generate(args.out, args.nodes, loops=args.loops)
    print(f"wrote {args.out}: {info['num_nodes']} nodes, "
          f"{info['num_submaps']} submaps, {info['num_inter']} inter "
          "constraints (official protobuf runtime, reference schema)")


if __name__ == "__main__":
    main()
