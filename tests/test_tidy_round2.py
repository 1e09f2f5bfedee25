"""Round-2 tidy coverage: table_lookup, PointCloud.compact, compressed-cloud
serialization convergence, voxel-key sentinel safety, local_to_global."""

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.ops.onehot import table_lookup
from cartographer_tpu.sensor.compression import compress_cloud, decompress_cloud
from cartographer_tpu.sensor.point_cloud import PointCloud
from cartographer_tpu.sensor.voxel_filter import voxel_filter


class TestTableLookup:
    def test_matches_gather(self):
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.normal(size=1024).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 1024, size=(7, 33)).astype(np.int32))
        np.testing.assert_allclose(table_lookup(table, idx), np.asarray(table)[idx])

    def test_non_multiple_of_32_table(self):
        rng = np.random.default_rng(1)
        table = jnp.asarray(rng.normal(size=77).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 77, size=100).astype(np.int32))
        np.testing.assert_allclose(table_lookup(table, idx), np.asarray(table)[idx])

    def test_edge_indices(self):
        table = jnp.arange(64, dtype=jnp.float32)
        idx = jnp.array([0, 31, 32, 63], jnp.int32)
        np.testing.assert_allclose(table_lookup(table, idx), [0, 31, 32, 63])


class TestCompact:
    def _cloud(self):
        pts = jnp.arange(20, dtype=jnp.float32).reshape(10, 2)
        mask = jnp.array([True, False, True, True, False, True, False, True, True, False])
        return PointCloud(points=pts, mask=mask,
                          intensities=jnp.arange(10, dtype=jnp.float32))

    def test_preserves_valid_points_and_order(self):
        c = self._cloud().compact(8)
        got = np.asarray(c.points)[np.asarray(c.mask)]
        want = np.asarray(self._cloud().points)[np.asarray(self._cloud().mask)]
        np.testing.assert_array_equal(got, want)

    def test_truncates_beyond_capacity(self):
        c = self._cloud().compact(3)
        assert int(jnp.sum(c.mask)) == 3
        want = np.asarray(self._cloud().points)[np.asarray(self._cloud().mask)][:3]
        np.testing.assert_array_equal(np.asarray(c.points)[np.asarray(c.mask)], want)

    def test_intensities_follow_points(self):
        c = self._cloud().compact(8)
        got = np.asarray(c.intensities)[np.asarray(c.mask)]
        np.testing.assert_array_equal(got, [0, 2, 3, 5, 7, 8])


class TestCompressedCloudSerialization:
    def test_roundtrip_3d(self):
        rng = np.random.default_rng(2)
        pts = rng.normal(scale=30.0, size=(500, 3))
        out = decompress_cloud(compress_cloud(pts))
        assert out.shape == pts.shape
        np.testing.assert_allclose(out, pts, atol=6e-4)

    def test_roundtrip_2d(self):
        rng = np.random.default_rng(3)
        pts = rng.normal(scale=50.0, size=(200, 2))  # beyond old int16 32.7 m clip
        out = decompress_cloud(compress_cloud(pts))
        assert out.shape == pts.shape
        np.testing.assert_allclose(out, pts, atol=6e-4)

    def test_empty(self):
        out = decompress_cloud(compress_cloud(np.zeros((0, 3))))
        assert out.shape == (0, 3)

    def test_serialization_uses_compression(self):
        from cartographer_tpu.io.serialization import _dequantize_cloud, _quantize_cloud

        pts = np.array([[40.0, -40.0], [0.001, 0.002]])
        d = _quantize_cloud(pts)
        assert "offsets" in d  # compressed payload, not legacy __nd__ int16
        np.testing.assert_allclose(_dequantize_cloud(d), pts, atol=6e-4)


class TestVoxelKeySentinel:
    def test_far_corner_points_survive(self):
        # Points clipping to the max voxel on both axes must not pack to the
        # masked-point sentinel key (ADVICE round 1).
        pts = jnp.array([[1e9, 1e9], [1e9 + 5.0, 1e9 + 5.0], [0.0, 0.0]],
                        jnp.float32)
        mask = jnp.array([True, True, True])
        cloud = PointCloud(points=pts, mask=mask,
                           intensities=jnp.zeros(3, jnp.float32))
        out = voxel_filter(cloud, 0.5)
        kept = np.asarray(out.mask)
        # Both far points clip into the same border voxel -> exactly one kept,
        # plus the origin point.
        assert kept.sum() == 2
        assert kept[2]
        assert kept[0] or kept[1]


class TestLocalToGlobal:
    def test_identity_before_submaps(self):
        from cartographer_tpu.core.config import PoseGraphOptions
        from cartographer_tpu.mapping.pose_graph_2d import PoseGraph2D

        pg = PoseGraph2D(PoseGraphOptions())
        np.testing.assert_array_equal(pg.local_to_global(0), np.zeros(3))

    def test_offset_after_optimization_shift(self):
        from cartographer_tpu.core.config import PoseGraphOptions
        from cartographer_tpu.mapping.pose_graph_2d import (
            PoseGraph2D,
            SubmapDataEntry,
            _compose2d,
        )

        pg = PoseGraph2D(PoseGraphOptions())

        class FakeSubmap:
            local_pose_translation = np.array([1.0, 2.0, 0.0])
            local_pose_rotation = np.array([1.0, 0.0, 0.0, 0.0])

        from cartographer_tpu.mapping.id import SubmapId

        pg.submap_data.insert(SubmapId(0, 0), SubmapDataEntry(
            submap=FakeSubmap(), global_pose_2d=np.array([4.0, 2.0, 0.0])))
        offset = pg.local_to_global(0)
        # Applying the offset to the local submap pose must give the global.
        np.testing.assert_allclose(
            _compose2d(offset, np.array([1.0, 2.0, 0.0])),
            np.array([4.0, 2.0, 0.0]), atol=1e-12)
