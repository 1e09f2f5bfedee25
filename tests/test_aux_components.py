"""Tests for compression, MapByTime, trimmers, and the submap painter
(reference: compressed_point_cloud_test.cc, map_by_time_test.cc,
pose_graph_trimmer tests, submap_painter)."""

import numpy as np
import pytest

from cartographer_tpu.core.config import PoseGraphOptions
from cartographer_tpu.mapping.constraint_builder_2d import Constraint
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.pose_graph_2d import (
    PoseGraph2D,
    SubmapDataEntry,
    TrajectoryNode,
)
from cartographer_tpu.mapping.submap_2d import Submap2D
from cartographer_tpu.mapping.trimmers import PureLocalizationTrimmer
from cartographer_tpu.ops.grid_2d import Grid2D, insert_range_data
from cartographer_tpu.sensor.compression import PRECISION, CompressedPointCloud
from cartographer_tpu.sensor.map_by_time import MapByTime
from cartographer_tpu.sensor.point_cloud import PointCloud, RangeData

import jax.numpy as jnp


class TestCompressedPointCloud:
    def test_roundtrip_precision(self):
        rng = np.random.RandomState(0)
        pts = rng.uniform(-30, 30, (500, 3))
        c = CompressedPointCloud(pts)
        assert len(c) == 500
        out = c.decompress_in_input_order()
        np.testing.assert_allclose(out, pts, atol=PRECISION)

    def test_compression_ratio(self):
        rng = np.random.RandomState(1)
        # Spatially clustered points compress well.
        pts = rng.uniform(0, 0.5, (2000, 3))
        c = CompressedPointCloud(pts)
        raw_bytes = pts.astype(np.float32).nbytes
        assert c.num_bytes < raw_bytes / 2

    def test_empty(self):
        c = CompressedPointCloud(np.zeros((0, 3)))
        assert len(c) == 0
        assert c.decompress().shape == (0, 3)


class TestMapByTime:
    def test_append_and_trim(self):
        m = MapByTime()
        for t in [10, 20, 30, 40]:
            m.append(0, t, f"d{t}")
        assert m.earliest_time(0) == 10
        m.trim(0, keep_after=30)
        times = [t for t, _ in m.trajectory(0)]
        # One entry before keep_after retained for interpolation.
        assert times == [20, 30, 40]

    def test_rejects_out_of_order(self):
        m = MapByTime()
        m.append(0, 10, "a")
        with pytest.raises(ValueError):
            m.append(0, 5, "b")


def make_graph_with_submaps(num_submaps=5, nodes_per_submap=3):
    pg = PoseGraph2D(PoseGraphOptions())
    node_index = 0
    for s in range(num_submaps):
        grid = Grid2D.create(32, 0.1, jnp.zeros(2))
        submap = Submap2D(
            local_pose_translation=np.array([s * 1.0, 0, 0]),
            local_pose_rotation=np.array([1.0, 0, 0, 0]),
            insertion_finished=True, grid=grid)
        entry = SubmapDataEntry(submap=submap,
                                global_pose_2d=np.array([s * 1.0, 0, 0]),
                                finished=True)
        sid_index = pg.submap_data.append(0, entry)
        sid = SubmapId(0, sid_index)
        for _ in range(nodes_per_submap):
            node = TrajectoryNode(
                time=node_index * 1000,
                gravity_alignment=np.array([1.0, 0, 0, 0]),
                filtered_points=np.zeros((1, 2)),
                local_pose_translation=np.array([s * 1.0, 0, 0]),
                local_pose_rotation=np.array([1.0, 0, 0, 0]),
                global_pose_2d=np.array([s * 1.0, 0, 0]))
            ni = pg.nodes.append(0, node)
            nid = NodeId(0, ni)
            entry.node_ids.add(nid)
            pg.constraints.append(Constraint(
                submap_id=sid, node_id=nid, rel=np.zeros(3),
                translation_weight=1.0, rotation_weight=1.0,
                tag="INTRA_SUBMAP"))
            node_index += 1
    return pg


class TestTrimming:
    def test_pure_localization_trimmer(self):
        pg = make_graph_with_submaps(num_submaps=5)
        assert len(pg.submap_data) == 5
        trimmer = PureLocalizationTrimmer(trajectory_id=0, max_submaps_to_keep=2)
        trimmer.trim(pg)
        assert len(pg.submap_data) == 2
        # Remaining submaps are the newest.
        assert [i for i, _ in pg.submap_data.trajectory(0)] == [3, 4]
        # Nodes belonging only to trimmed submaps are gone.
        assert len(pg.nodes) == 6
        # No constraint references a trimmed submap.
        for c in pg.constraints:
            assert c.submap_id.submap_index in (3, 4)

    def test_trim_is_idempotent(self):
        pg = make_graph_with_submaps(num_submaps=3)
        trimmer = PureLocalizationTrimmer(0, 2)
        trimmer.trim(pg)
        trimmer.trim(pg)
        assert len(pg.submap_data) == 2


class TestSubmapPainter:
    def test_paint_map(self, tmp_path):
        from cartographer_tpu.io.submap_painter import paint_map, submap_to_image

        pg = PoseGraph2D(PoseGraphOptions())
        grid = Grid2D.create(128, 0.05, jnp.zeros(2))
        pts = np.stack([np.full(50, 2.013), np.linspace(-1, 1, 50)], -1)
        rd = RangeData(origin=jnp.zeros(2),
                       returns=PointCloud.from_numpy(pts.astype(np.float32), 64),
                       misses=PointCloud.empty(64, 2))
        # ~55 inserts saturate the miss clamp (free cells -> p=0.1).
        for _ in range(60):
            grid = insert_range_data(grid, rd, ray_samples=128, method="scatter")
        submap = Submap2D(local_pose_translation=np.zeros(3),
                          local_pose_rotation=np.array([1.0, 0, 0, 0]),
                          insertion_finished=True, grid=grid)
        pg.submap_data.insert(SubmapId(0, 0), SubmapDataEntry(
            submap=submap, global_pose_2d=np.zeros(3), finished=True))

        img, origin = submap_to_image(grid)
        assert img.min() < 100  # occupied pixels
        assert img.max() > 200  # free pixels
        out = paint_map(pg, path=str(tmp_path / "map.png"))
        assert (tmp_path / "map.png").exists()
        assert out.min() < 100 and out.max() > 200
