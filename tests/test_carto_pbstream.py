"""Wire interop with the reference's pbstream schema, validated against
protoc-compiled bindings generated from the reference's own .proto files
(read from /root/reference at test time; skipped if unavailable)."""

import math
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "cartographer/mapping/proto")),
    reason="reference protos unavailable")


@pytest.fixture(scope="module")
def ref_protos(tmp_path_factory):
    """protoc-compile the reference protos and import the bindings."""
    out = tmp_path_factory.mktemp("ref_protos")
    protos = []
    for sub in ("mapping/proto", "mapping/proto/pose_graph",
                "mapping/proto/scan_matching", "sensor/proto",
                "transform/proto", "common/proto"):
        d = os.path.join(REF, "cartographer", sub)
        if os.path.isdir(d):
            protos += [os.path.join(d, f) for f in os.listdir(d)
                       if f.endswith(".proto")]
    try:
        subprocess.run(
            ["protoc", f"-I{REF}", f"--python_out={out}"] + protos,
            check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError) as e:
        pytest.skip(f"protoc unavailable/failed: {e}")
    # Package dirs need __init__.py for the generated absolute imports.
    for root, dirs, _ in os.walk(out):
        for d in dirs:
            open(os.path.join(root, d, "__init__.py"), "a").close()
    open(os.path.join(out, "__init__.py"), "a").close()
    sys.path.insert(0, str(out))
    try:
        from cartographer.mapping.proto import serialization_pb2
    except Exception as e:  # noqa: BLE001
        sys.path.pop(0)
        pytest.skip(f"generated bindings unusable: {e}")
    yield serialization_pb2
    sys.path.pop(0)


def build_2d_state():
    """Small real 2D SLAM state via the fixtures."""
    from cartographer_tpu.core.config import (
        MapBuilderOptions,
        TrajectoryBuilderOptions,
        apply_overrides,
    )
    from cartographer_tpu.core.time import from_seconds
    from cartographer_tpu.mapping.map_builder import MapBuilder
    from cartographer_tpu.sensor.data import TimedPointCloudData

    sys.path.insert(0, os.path.dirname(__file__))
    from test_local_slam_2d import make_wall_points, scan_at, small_options

    tb2 = small_options(**{"submaps.num_range_data": 6,
                           "motion_filter.max_distance_meters": 0.01})
    traj = TrajectoryBuilderOptions(trajectory_builder_2d=tb2)
    mb = MapBuilder(apply_overrides(
        MapBuilderOptions(use_trajectory_builder_2d=True),
        {"pose_graph.optimize_every_n_nodes": 10}))
    tid = mb.add_trajectory_builder(["laser"], traj)
    world = make_wall_points(num=250, seed=11)
    t0 = 1_000_000_000
    for i in range(14):
        mb.add_sensor_data(tid, "laser", TimedPointCloudData(
            time=t0 + from_seconds(i * 0.1), origin=np.zeros(3, np.float32),
            ranges=scan_at(world, np.array([0.05 * i, 0.0]), 0.0),
            times=np.zeros(len(world), np.float32)))
    mb.finish_trajectory(tid)
    mb.pose_graph.run_final_optimization()
    return mb


class TestWireInterop:
    def test_reference_bindings_parse_our_stream(self, ref_protos, tmp_path):
        """Every record we write must parse as the reference's protos with
        the right content."""
        mb = build_2d_state()
        path = tmp_path / "state.pbstream"
        mb.serialize_state(str(path), format="carto")

        from cartographer_tpu.io.pbstream import ProtoStreamReader

        records = list(ProtoStreamReader(str(path)))
        header = ref_protos.SerializationHeader.FromString(records[0])
        assert header.format_version == 2

        datas = [ref_protos.SerializedData.FromString(r) for r in records[1:]]
        kinds = [d.WhichOneof("data") for d in datas]
        assert kinds[0] == "pose_graph"
        assert kinds[1] == "all_trajectory_builder_options"
        assert "submap" in kinds and "node" in kinds

        pg = datas[0].pose_graph
        assert len(pg.trajectory) == 1
        traj = pg.trajectory[0]
        assert len(traj.node) == len(mb.pose_graph.nodes)
        assert len(traj.submap) == len(mb.pose_graph.submap_data)
        assert len(pg.constraint) == len(mb.pose_graph.constraints)
        # Node poses must match our optimized global poses.
        our = {i: n.global_pose_2d
               for (t, i), n in mb.pose_graph.nodes.items()}
        for n in traj.node:
            expect = our[n.node_index]
            assert abs(n.pose.translation.x - expect[0]) < 1e-6
            assert abs(n.pose.translation.y - expect[1]) < 1e-6

        # Submap grid: known cell values in [1, 32767], unknown 0, and the
        # grid type marker present.
        sub = next(d.submap for d, k in zip(datas, kinds) if k == "submap")
        grid = sub.submap_2d.grid
        cells = np.asarray(grid.cells)
        assert grid.limits.cell_limits.num_x_cells > 0
        assert cells.min() >= 0 and cells.max() <= 32767
        assert grid.HasField("probability_grid_2d")
        assert abs(grid.limits.resolution - 0.05) < 1e-9

        # Node cloud decodes through the reference's iterator semantics.
        node = next(d.node for d, k in zip(datas, kinds) if k == "node")
        cpc = node.node_data.filtered_gravity_aligned_point_cloud
        stream = list(cpc.point_data)
        pts = []
        i = 0
        while len(pts) < cpc.num_points:
            count = stream[i]
            bx, by, bz = (stream[i + 1] << 10, stream[i + 2] << 10,
                          stream[i + 3] << 10)
            i += 4
            for w in stream[i:i + count]:
                pts.append([(bx + (w & 0x3FF)) * 0.001,
                            (by + ((w >> 10) & 0x3FF)) * 0.001,
                            (bz + (w >> 20)) * 0.001])
            i += count
        pts = np.asarray(pts)
        from cartographer_tpu.mapping.id import NodeId
        first_id = sorted((t, i) for (t, i), _ in mb.pose_graph.nodes.items())[0]
        ours = mb.pose_graph.nodes[NodeId(*first_id)]
        ours_pts = np.asarray(ours.filtered_points)[:, :2]
        assert len(pts) == len(ours_pts)
        # Block grouping reorders points; compare as sorted 1 mm-rounded sets.
        a = sorted(map(tuple, np.round(pts[:, :2], 3)))
        b = sorted(map(tuple, np.round(ours_pts, 3)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1.1e-3)

    def test_load_reference_produced_stream(self, ref_protos, tmp_path):
        """A stream built with the actual protobuf library (as the C++
        reference would emit) loads into our MapBuilder."""
        import gzip
        import struct

        sz = ref_protos
        from cartographer.mapping.proto import (
            pose_graph_pb2,
            trajectory_pb2,
        )

        header = sz.SerializationHeader()
        header.format_version = 2

        pg = sz.SerializedData()
        traj = pg.pose_graph.trajectory.add()
        traj.trajectory_id = 0
        sub = traj.submap.add()
        sub.submap_index = 0
        sub.pose.translation.x = 1.0
        sub.pose.rotation.w = 1.0
        node = traj.node.add()
        node.node_index = 0
        node.timestamp = 123456
        node.pose.translation.x = 1.25
        node.pose.rotation.w = 1.0
        con = pg.pose_graph.constraint.add()
        con.submap_id.trajectory_id = 0
        con.submap_id.submap_index = 0
        con.node_id.trajectory_id = 0
        con.node_id.node_index = 0
        con.relative_pose.translation.x = 0.25
        con.relative_pose.rotation.w = 1.0
        con.translation_weight = 100.0
        con.rotation_weight = 10.0
        con.tag = 0  # INTRA_SUBMAP

        opts = sz.SerializedData()
        opts.all_trajectory_builder_options.options_with_sensor_ids.add()

        submap = sz.SerializedData()
        submap.submap.submap_id.trajectory_id = 0
        submap.submap.submap_id.submap_index = 0
        s2d = submap.submap.submap_2d
        s2d.local_pose.translation.x = 1.0
        s2d.local_pose.rotation.w = 1.0
        s2d.num_range_data = 5
        s2d.finished = True
        g = s2d.grid
        g.limits.resolution = 0.05
        g.limits.max.x = 3.0
        g.limits.max.y = 4.0
        g.limits.cell_limits.num_x_cells = 20
        g.limits.cell_limits.num_y_cells = 30
        cells = np.zeros((20 * 30,), np.int64)
        cells[7 * 20 + 3] = 32767  # one occupied-ish cell
        g.cells.extend(int(v) for v in cells)
        g.probability_grid_2d.SetInParent()
        g.min_correspondence_cost = 0.1
        g.max_correspondence_cost = 0.9

        nrec = sz.SerializedData()
        nrec.node.node_id.trajectory_id = 0
        nrec.node.node_id.node_index = 0
        nd = nrec.node.node_data
        nd.timestamp = 123456
        nd.gravity_alignment.w = 1.0
        nd.local_pose.translation.x = 1.25
        nd.local_pose.rotation.w = 1.0
        nd.filtered_gravity_aligned_point_cloud.num_points = 2
        # Two points: (0.001, 0.002, 0) and (0.003, 0.004, 0) in one block.
        nd.filtered_gravity_aligned_point_cloud.point_data.extend(
            [2, 0, 0, 0, (2 << 10) + 1, (4 << 10) + 3])

        path = tmp_path / "ref.pbstream"
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", 0x7b1d1f7b5bf501db))
            for msg in (header, pg, opts, submap, nrec):
                blob = gzip.compress(msg.SerializeToString())
                f.write(struct.pack("<Q", len(blob)))
                f.write(blob)

        from cartographer_tpu.core.config import MapBuilderOptions
        from cartographer_tpu.mapping.map_builder import MapBuilder

        mb = MapBuilder(MapBuilderOptions(use_trajectory_builder_2d=True))
        remap = mb.load_state(str(path), load_frozen_state=True)
        assert remap == {0: 0}
        pgour = mb.pose_graph
        assert len(pgour.nodes) == 1 and len(pgour.submap_data) == 1
        from cartographer_tpu.mapping.id import NodeId, SubmapId
        node_our = pgour.nodes[NodeId(0, 0)]
        assert node_our.time == 123456
        np.testing.assert_allclose(node_our.global_pose_2d,
                                   [1.25, 0, 0], atol=1e-6)
        np.testing.assert_allclose(
            np.sort(node_our.filtered_points[:, 0]), [0.001, 0.003], atol=1e-6)
        entry = pgour.submap_data[SubmapId(0, 0)]
        assert entry.submap.num_range_data == 5
        grid_our = entry.submap.grid
        # The single known cell: ref (rx=3, ry=7) -> our (i=S0-1-7, j=S1-1-3)
        # with S0=num_y=30, S1=num_x=20.
        known = np.asarray(grid_our.known)
        assert known.sum() == 1
        i, j = map(int, np.argwhere(known)[0])
        assert (i, j) == (30 - 1 - 7, 20 - 1 - 3)
        # Value 32767 = max cost 0.9 = probability 0.1.
        from cartographer_tpu.ops.probability import log_odds_to_probability
        p = float(log_odds_to_probability(np.asarray(grid_our.log_odds)[i, j]))
        assert abs(p - 0.1) < 1e-3
        assert pgour.trajectory_states[0] == "FROZEN"

    def test_round_trip_through_our_reader(self, tmp_path):
        """carto-format write -> our loader: state survives."""
        mb = build_2d_state()
        path = tmp_path / "rt.pbstream"
        mb.serialize_state(str(path), format="carto")

        from cartographer_tpu.core.config import MapBuilderOptions
        from cartographer_tpu.mapping.map_builder import MapBuilder

        mb2 = MapBuilder(MapBuilderOptions(use_trajectory_builder_2d=True))
        mb2.load_state(str(path), load_frozen_state=False)
        pg1, pg2 = mb.pose_graph, mb2.pose_graph
        assert len(pg1.nodes) == len(pg2.nodes)
        assert len(pg1.submap_data) == len(pg2.submap_data)
        assert len(pg1.constraints) == len(pg2.constraints)
        from cartographer_tpu.mapping.id import NodeId
        for (t, i), n1 in pg1.nodes.items():
            n2 = pg2.nodes[NodeId(t, i)]
            np.testing.assert_allclose(n1.global_pose_2d, n2.global_pose_2d,
                                       atol=1e-6)
        # Grid round-trip: probabilities within the uint16 quantization.
        from cartographer_tpu.mapping.id import SubmapId
        for (t, i), e1 in pg1.submap_data.items():
            if e1.submap.grid is None:
                continue
            e2 = pg2.submap_data[SubmapId(t, i)]
            k1 = np.asarray(e1.submap.grid.known)
            k2 = np.asarray(e2.submap.grid.known)
            np.testing.assert_array_equal(k1, k2)
            p1 = 1 / (1 + np.exp(-np.asarray(e1.submap.grid.log_odds)))
            p2 = 1 / (1 + np.exp(-np.asarray(e2.submap.grid.log_odds)))
            assert np.abs(np.where(k1, p1 - p2, 0.0)).max() < 2e-4
            np.testing.assert_allclose(
                np.asarray(e1.submap.grid.origin),
                np.asarray(e2.submap.grid.origin), atol=1e-6)
