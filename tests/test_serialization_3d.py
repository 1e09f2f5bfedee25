"""3D state serialization round-trip (reference: map_builder_test.cc
SaveLoadState for the 3D variant)."""

import io as pyio

import jax.numpy as jnp
import numpy as np

from cartographer_tpu.core.config import PoseGraphOptions
from cartographer_tpu.io.pbstream import ProtoStreamReader, ProtoStreamWriter
from cartographer_tpu.io.serialization import load_state, serialize_state
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.pose_graph_3d import (
    Constraint3D,
    PoseGraph3D,
    SubmapDataEntry3D,
    TrajectoryNode3D,
)
from cartographer_tpu.mapping.submap_3d import Submap3D
from cartographer_tpu.ops.grid_3d import Grid3D


def make_pose_graph_3d():
    pg = PoseGraph3D(PoseGraphOptions())
    high = Grid3D.create(16, 0.2, jnp.zeros(3))
    low = Grid3D.create(8, 0.6, jnp.zeros(3))
    submap = Submap3D(
        local_pose_translation=np.array([1.0, 2.0, 0.0]),
        local_pose_rotation=np.array([1.0, 0, 0, 0]),
        num_range_data=10, insertion_finished=True,
        high_grid=high, low_grid=low, histogram=np.arange(12.0))
    pg.submap_data.insert(SubmapId(0, 0), SubmapDataEntry3D(
        submap=submap, global_t=np.array([1.0, 2.0, 0.0]),
        global_q=np.array([1.0, 0, 0, 0]), finished=True))
    rng = np.random.RandomState(0)
    pg.nodes.insert(NodeId(0, 0), TrajectoryNode3D(
        time=42, gravity_alignment=np.array([1.0, 0, 0, 0]),
        high_res_cloud=rng.uniform(-3, 3, (30, 3)),
        low_res_cloud=rng.uniform(-3, 3, (50, 3)),
        scan_histogram=np.arange(12.0),
        local_pose_translation=np.array([1.2, 2.0, 0.1]),
        local_pose_rotation=np.array([1.0, 0, 0, 0]),
        global_t=np.array([1.2, 2.0, 0.1]),
        global_q=np.array([1.0, 0, 0, 0])))
    pg.constraints.append(Constraint3D(
        submap_id=SubmapId(0, 0), node_id=NodeId(0, 0),
        rel_t=np.array([0.2, 0.0, 0.1]), rel_q=np.array([1.0, 0, 0, 0]),
        translation_weight=100.0, rotation_weight=200.0, tag="INTRA_SUBMAP"))
    return pg


def test_roundtrip_3d():
    pg = make_pose_graph_3d()
    buf = pyio.BytesIO()
    serialize_state(pg, ProtoStreamWriter(buf))
    buf.seek(0)
    pg2 = PoseGraph3D(PoseGraphOptions())
    remap = load_state(ProtoStreamReader(buf), pg2)
    assert remap == {0: 0}
    assert len(pg2.nodes) == 1 and len(pg2.submap_data) == 1
    n = pg2.nodes[NodeId(0, 0)]
    orig = pg.nodes[NodeId(0, 0)]
    np.testing.assert_allclose(n.high_res_cloud, orig.high_res_cloud, atol=1e-3)
    np.testing.assert_allclose(n.global_t, orig.global_t)
    e = pg2.submap_data[SubmapId(0, 0)]
    assert e.finished and e.submap.high_grid is not None
    assert e.submap.high_grid.size == 16
    np.testing.assert_allclose(e.submap.histogram, np.arange(12.0))
    c = pg2.constraints[0]
    np.testing.assert_allclose(c.rel_t, [0.2, 0.0, 0.1])


def test_frozen_3d():
    pg = make_pose_graph_3d()
    buf = pyio.BytesIO()
    serialize_state(pg, ProtoStreamWriter(buf))
    buf.seek(0)
    pg2 = PoseGraph3D(PoseGraphOptions())
    load_state(ProtoStreamReader(buf), pg2, frozen=True)
    assert 0 in pg2._frozen_trajectories
