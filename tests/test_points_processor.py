"""Points-processor pipeline tests (reference: io/*_test.cc for the
processors and points_processor_pipeline_builder)."""

import os
import tempfile

import numpy as np
import pytest

from cartographer_tpu.io.points_processor import (
    FLUSH_RESTART,
    CountingPointsProcessor,
    FixedRatioSamplingPointsProcessor,
    MinMaxRangeFilteringPointsProcessor,
    NullPointsProcessor,
    OutlierRemovingPointsProcessor,
    PointsBatch,
    VerticalRangeFilteringPointsProcessor,
    build_pipeline,
    run_pipeline,
)


def batch(points, origin=(0, 0, 0), frame_id="lidar"):
    return PointsBatch(
        origin=np.asarray(origin, float),
        points=np.asarray(points, float),
        frame_id=frame_id)


class TestFilters:
    def test_min_max_range(self):
        count = CountingPointsProcessor(NullPointsProcessor())
        p = MinMaxRangeFilteringPointsProcessor(1.0, 5.0, count)
        p.process(batch([[0.5, 0, 0], [2, 0, 0], [6, 0, 0]]))
        assert count.num_points == 1

    def test_vertical_range(self):
        count = CountingPointsProcessor(NullPointsProcessor())
        p = VerticalRangeFilteringPointsProcessor(-1.0, 1.0, count)
        p.process(batch([[0, 0, 0.5], [0, 0, 2.0], [0, 0, -3.0]]))
        assert count.num_points == 1

    def test_fixed_ratio(self):
        count = CountingPointsProcessor(NullPointsProcessor())
        p = FixedRatioSamplingPointsProcessor(0.5, count, seed=3)
        p.process(batch(np.random.RandomState(0).rand(1000, 3)))
        assert 350 < count.num_points < 650


class TestWriters:
    def test_xyz_ply_pcd(self, tmp_path):
        pts = np.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
        pipeline = build_pipeline([
            {"action": "write_xyz", "filename": str(tmp_path / "o.xyz")},
            {"action": "write_ply", "filename": str(tmp_path / "o.ply")},
            {"action": "write_pcd", "filename": str(tmp_path / "o.pcd")},
        ])
        run_pipeline(pipeline, lambda: [batch(pts)])
        xyz = (tmp_path / "o.xyz").read_text().strip().splitlines()
        assert len(xyz) == 2 and xyz[0].startswith("1.0 2.0")
        ply = (tmp_path / "o.ply").read_bytes()
        assert ply.startswith(b"ply\nformat binary_little_endian")
        assert b"element vertex 2" in ply
        pcd = (tmp_path / "o.pcd").read_text()
        assert "POINTS 2" in pcd and "DATA ascii" in pcd

    def test_xray_image(self, tmp_path):
        rng = np.random.RandomState(0)
        pts = rng.uniform(0, 2, (500, 3))
        pipeline = build_pipeline([
            {"action": "write_xray", "voxel_size": 0.1,
             "filename": str(tmp_path / "x.png")}])
        run_pipeline(pipeline, lambda: [batch(pts)])
        from PIL import Image
        img = Image.open(tmp_path / "x.png")
        assert img.size[0] >= 19 and img.size[1] >= 19


class TestOutlierRemoval:
    def test_multipass_removes_moving_objects(self):
        # Static wall at x=5 (hit every scan) + a transient point at x=2.5
        # seen once but crossed by all later rays -> removed.
        wall = [[5.0, y * 0.05, 0.0] for y in range(-5, 6)]
        ghost = [[2.5, 0.0, 0.0]]

        def source():
            yield batch(ghost)  # moving object: present in one scan
            for _ in range(10):
                yield batch(wall)

        count = CountingPointsProcessor(NullPointsProcessor())
        p = OutlierRemovingPointsProcessor(0.5, miss_per_hit_limit=3.0,
                                           next_processor=count)
        passes = run_pipeline(p, lambda: list(source()))
        assert passes == 3  # hits pass, rays pass, emit pass
        # Wall points survive; the ghost (crossed by ~11 rays x 10 scans,
        # hit once) is removed.
        assert count.num_points == 10 * len(wall)


class TestPipelineBuilder:
    def test_unknown_action_raises(self):
        with pytest.raises(KeyError):
            build_pipeline([{"action": "does_not_exist"}])

    def test_chain_order(self):
        # range filter applies before counting.
        pipeline = build_pipeline([
            {"action": "min_max_range_filter", "min_range": 1.0, "max_range": 3.0},
            {"action": "count"},
        ])
        pipeline.process(batch([[0.1, 0, 0], [2.0, 0, 0]]))
        count = pipeline._next
        assert isinstance(count, CountingPointsProcessor)
        assert count.num_points == 1


class TestPbstreamCli:
    def test_info_and_migrate(self, tmp_path):
        import io as pyio
        import msgpack
        from cartographer_tpu.io.pbstream import ProtoStreamWriter
        from cartographer_tpu.io.pbstream_main import info, migrate

        # A fake v1 stream.
        path = tmp_path / "v1.pbstream"
        w = ProtoStreamWriter(str(path))
        w.write(msgpack.packb({"type": "header", "format_version": 1}))
        w.write(msgpack.packb({"type": "submap", "id": [0, 0]}))
        w.close()
        assert info(str(path)) == 0
        out = tmp_path / "v2.pbstream"
        assert migrate(str(path), str(out)) == 0
        from cartographer_tpu.io.pbstream import ProtoStreamReader
        records = [msgpack.unpackb(r, raw=False) for r in ProtoStreamReader(str(out))]
        assert records[0]["format_version"] == 2
        assert records[1]["finished"] is True  # v1->v2 migration default


class TestGridWritingProcessors:
    def _batches(self):
        from cartographer_tpu.io.points_processor import PointsBatch
        rng = np.random.RandomState(3)
        batches = []
        for i in range(3):
            origin = np.array([0.1 * i, 0.0, 0.5])
            # wall of points at x=2
            pts = np.stack([np.full(50, 2.0), rng.uniform(-1, 1, 50),
                            np.full(50, 0.5)], -1)
            batches.append(PointsBatch(origin=origin, points=pts))
        return batches

    def test_write_probability_grid_png(self, tmp_path):
        from cartographer_tpu.io.points_processor import build_pipeline, run_pipeline
        path = str(tmp_path / "grid.png")
        pipe = build_pipeline([{"action": "write_probability_grid",
                                "resolution": 0.05, "filename": path,
                                "draw_trajectories": False}])
        run_pipeline(pipe, self._batches)
        from PIL import Image
        img = np.asarray(Image.open(path))
        assert img.size > 0
        # hit cells dark (occupied), free-space lighter than unknown mid-gray
        assert img.min() < 100 and img.max() > 128

    def test_write_probability_grid_pb(self, tmp_path):
        import msgpack
        from cartographer_tpu.io.points_processor import build_pipeline, run_pipeline
        path = str(tmp_path / "grid.pb")
        pipe = build_pipeline([{"action": "write_probability_grid",
                                "resolution": 0.05, "filename": path,
                                "output_type": "pb"}])
        run_pipeline(pipe, self._batches)
        d = msgpack.unpackb(open(path, "rb").read(), raw=False)
        probs = np.frombuffer(d["probabilities"], np.float32)
        assert d["num_cells"] == len(probs) > 0
        assert probs.max() > 0.5 and probs.min() < 0.5

    def test_write_hybrid_grid(self, tmp_path):
        import msgpack
        from cartographer_tpu.io.points_processor import build_pipeline, run_pipeline
        path = str(tmp_path / "grid3d.msgpack")
        pipe = build_pipeline([{"action": "write_hybrid_grid",
                                "voxel_size": 0.1, "filename": path}])
        run_pipeline(pipe, self._batches)
        d = msgpack.unpackb(open(path, "rb").read(), raw=False)
        cells = np.frombuffer(d["cells"], np.int64).reshape(-1, 3)
        probs = np.frombuffer(d["probabilities"], np.float32)
        assert len(cells) == d["num_cells"] > 0
        # occupied voxels at the wall x=2: cell x index = 2/0.1 = 20
        occ = cells[probs > 0.5]
        assert np.any(occ[:, 0] == 20)
