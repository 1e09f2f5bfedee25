"""pbstream + state serialization round-trip tests (reference:
io/proto_stream_test.cc, map_builder_test.cc SaveLoadState,
serialization_format_migration_test.cc)."""

import io as pyio

import numpy as np
import pytest

from cartographer_tpu.core.config import PoseGraphOptions
from cartographer_tpu.io.pbstream import MAGIC, ProtoStreamReader, ProtoStreamWriter
from cartographer_tpu.io.serialization import load_state, serialize_state
from cartographer_tpu.mapping.constraint_builder_2d import Constraint
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.pose_graph_2d import (
    PoseGraph2D,
    SubmapDataEntry,
    TrajectoryNode,
)
from cartographer_tpu.mapping.submap_2d import Submap2D
from cartographer_tpu.ops.grid_2d import Grid2D

import jax.numpy as jnp


class TestProtoStream:
    def test_roundtrip(self):
        buf = pyio.BytesIO()
        w = ProtoStreamWriter(buf)
        records = [b"hello", b"x" * 100000, b""]
        for r in records:
            w.write(r)
        buf.seek(0)
        r = ProtoStreamReader(buf)
        assert list(r) == records

    def test_magic_check(self):
        buf = pyio.BytesIO(b"not a pbstream at all")
        with pytest.raises(ValueError):
            ProtoStreamReader(buf)

    def test_magic_value_matches_reference(self):
        # io/proto_stream.cc kMagic
        assert MAGIC == 0x7B1D1F7B5BF501DB


def make_pose_graph():
    pg = PoseGraph2D(PoseGraphOptions())
    grid = Grid2D.create(32, 0.05, jnp.zeros(2))
    submap = Submap2D(
        local_pose_translation=np.array([1.0, 2.0, 0.0]),
        local_pose_rotation=np.array([1.0, 0, 0, 0]),
        num_range_data=20,
        insertion_finished=True,
        grid=grid)
    pg.submap_data.insert(
        SubmapId(0, 0),
        SubmapDataEntry(submap=submap, global_pose_2d=np.array([1.0, 2.0, 0.1]),
                        finished=True))
    rng = np.random.RandomState(0)
    node = TrajectoryNode(
        time=123456789,
        gravity_alignment=np.array([1.0, 0, 0, 0]),
        filtered_points=rng.uniform(-5, 5, (50, 2)),
        local_pose_translation=np.array([1.5, 2.0, 0.0]),
        local_pose_rotation=np.array([1.0, 0, 0, 0]),
        global_pose_2d=np.array([1.5, 2.0, 0.05]))
    pg.nodes.insert(NodeId(0, 0), node)
    pg.constraints.append(Constraint(
        submap_id=SubmapId(0, 0), node_id=NodeId(0, 0),
        rel=np.array([0.5, 0.0, -0.05]),
        translation_weight=500.0, rotation_weight=1600.0, tag="INTRA_SUBMAP"))
    return pg


class TestStateSerialization:
    def test_roundtrip(self):
        pg = make_pose_graph()
        buf = pyio.BytesIO()
        serialize_state(pg, ProtoStreamWriter(buf))
        buf.seek(0)

        pg2 = PoseGraph2D(PoseGraphOptions())
        remap = load_state(ProtoStreamReader(buf), pg2)
        assert remap == {0: 0}
        assert len(pg2.nodes) == 1
        assert len(pg2.submap_data) == 1
        assert len(pg2.constraints) == 1

        n = pg2.nodes[NodeId(0, 0)]
        orig = pg.nodes[NodeId(0, 0)]
        assert n.time == orig.time
        np.testing.assert_allclose(n.global_pose_2d, orig.global_pose_2d)
        # Cloud quantized to 1mm.
        np.testing.assert_allclose(n.filtered_points, orig.filtered_points, atol=1e-3)

        e = pg2.submap_data[SubmapId(0, 0)]
        assert e.finished
        np.testing.assert_allclose(e.global_pose_2d, [1.0, 2.0, 0.1])
        # Grid survives (log-odds stored f16).
        np.testing.assert_allclose(
            np.asarray(e.submap.grid.log_odds), np.asarray(pg.submap_data[
                SubmapId(0, 0)].submap.grid.log_odds), atol=1e-2)

    def test_remapping_on_existing_graph(self):
        pg = make_pose_graph()
        buf = pyio.BytesIO()
        serialize_state(pg, ProtoStreamWriter(buf))
        buf.seek(0)
        # Load into a graph that already has trajectory 0.
        pg2 = make_pose_graph()
        remap = load_state(ProtoStreamReader(buf), pg2)
        assert remap == {0: 1}
        assert len(pg2.nodes) == 2
        assert NodeId(1, 0) in pg2.nodes

    def test_frozen_load(self):
        pg = make_pose_graph()
        buf = pyio.BytesIO()
        serialize_state(pg, ProtoStreamWriter(buf))
        buf.seek(0)
        pg2 = PoseGraph2D(PoseGraphOptions())
        load_state(ProtoStreamReader(buf), pg2, frozen=True)
        assert 0 in pg2._frozen_trajectories
