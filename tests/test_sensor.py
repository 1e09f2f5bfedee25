"""Tests for sensor/: point clouds, voxel filters, collators.

Mirrors reference tests: sensor/point_cloud_test.cc,
sensor/internal/voxel_filter_test.cc, ordered_multi_queue_test.cc,
collator_test.cc.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.sensor import (
    Collator,
    OrderedMultiQueue,
    PointCloud,
    QueueKey,
    TrajectoryCollator,
    adaptive_voxel_filter,
    voxel_filter,
    voxel_filter_edge,
)
from cartographer_tpu.transform import Rigid2


class TestPointCloud:
    def test_padding_and_mask(self):
        pts = np.array([[1.0, 2.0], [3.0, 4.0]])
        pc = PointCloud.from_numpy(pts, capacity=8)
        assert pc.capacity == 8
        assert int(pc.num_valid()) == 2
        np.testing.assert_allclose(pc.to_numpy(), pts)

    def test_transform(self):
        pc = PointCloud.from_numpy(np.array([[1.0, 0.0]]), capacity=4)
        out = pc.transform(Rigid2.from_xytheta(0.0, 0.0, np.pi / 2))
        np.testing.assert_allclose(out.to_numpy(), [[0.0, 1.0]], atol=1e-6)


class TestVoxelFilter:
    def test_keeps_one_per_voxel(self):
        # Two clusters of points far apart: one survivor per cluster.
        pts = np.concatenate([
            np.random.RandomState(0).uniform(0, 0.01, (50, 3)),
            np.random.RandomState(1).uniform(5, 5.01, (30, 3)),
        ])
        pc = PointCloud.from_numpy(pts, capacity=128)
        out = voxel_filter(pc, resolution=0.3)
        assert int(out.num_valid()) == 2

    def test_preserves_sparse_cloud(self):
        pts = np.array([[0.0, 0.0, 0.0], [10.0, 0, 0], [0, 10.0, 0]])
        pc = PointCloud.from_numpy(pts, capacity=8)
        out = voxel_filter(pc, resolution=0.5)
        assert int(out.num_valid()) == 3

    def test_survivors_are_input_points(self):
        rng = np.random.RandomState(2)
        pts = rng.uniform(-3, 3, (100, 3))
        pc = PointCloud.from_numpy(pts, capacity=128)
        out = voxel_filter(pc, resolution=1.0)
        survivors = out.to_numpy()
        for s in survivors:
            assert np.min(np.linalg.norm(pts - s, axis=1)) < 1e-6

    def test_jittable(self):
        pc = PointCloud.from_numpy(np.random.RandomState(0).uniform(-1, 1, (60, 3)), capacity=64)
        f = jax.jit(lambda c: voxel_filter(c, 0.25))
        out = f(pc)
        assert int(out.num_valid()) > 0


class TestAdaptiveVoxelFilter:
    def test_returns_all_when_sparse(self):
        pts = np.random.RandomState(0).uniform(-1, 1, (20, 3))
        pc = PointCloud.from_numpy(pts, capacity=64)
        out = adaptive_voxel_filter(pc, max_length=0.5, min_num_points=100, max_range=50.0)
        assert int(out.num_valid()) == 20

    def test_hits_min_num_points(self):
        # Dense cloud on a line: coarse filter undershoots, adaptive search
        # must refine the edge length until >= min_num_points survive.
        t = np.linspace(0, 10, 500)
        pts = np.stack([t, np.zeros_like(t), np.zeros_like(t)], -1)
        pts += np.random.RandomState(1).normal(0, 0.01, pts.shape)
        pc = PointCloud.from_numpy(pts, capacity=512)
        out = adaptive_voxel_filter(pc, max_length=2.0, min_num_points=40, max_range=50.0)
        n = int(out.num_valid())
        assert n >= 40, n
        assert n < 500

    def test_max_range_crop(self):
        pts = np.array([[1.0, 0, 0]] * 5 + [[100.0, 0, 0]] * 5)
        pc = PointCloud.from_numpy(pts, capacity=16)
        out = adaptive_voxel_filter(pc, max_length=0.5, min_num_points=100, max_range=50.0)
        survivors = out.to_numpy()
        assert np.all(np.linalg.norm(survivors, axis=1) <= 50.0)


class TestEdgeVoxelFilter:
    def test_keeps_sparse_voxels(self):
        # 90 points in one voxel (bulk), 3 isolated points (edges).
        bulk = np.random.RandomState(0).uniform(0, 0.05, (90, 3))
        edges = np.array([[5.0, 0, 0], [0, 5.0, 0], [0, 0, 5.0]])
        pc = PointCloud.from_numpy(np.concatenate([bulk, edges]), capacity=128)
        out = voxel_filter_edge(pc, resolution=0.3, voxel_edge_ratio=0.5)
        survivors = out.to_numpy()
        assert len(survivors) == 3
        assert np.all(np.linalg.norm(survivors, axis=1) > 4)


class TestOrderedMultiQueue:
    def test_ordered_dispatch(self):
        q = OrderedMultiQueue()
        out = []
        for name in ["a", "b"]:
            q.add_queue(QueueKey(0, name), lambda t, d: out.append(d))
        q.add(QueueKey(0, "a"), 1, "a1")
        q.add(QueueKey(0, "a"), 3, "a3")
        assert out == []  # blocked: queue b empty
        q.add(QueueKey(0, "b"), 2, "b2")
        # a1 and b2 dispatch; a3 is held back because queue b is now empty.
        assert out == ["a1", "b2"]
        q.add(QueueKey(0, "b"), 4, "b4")
        assert out == ["a1", "b2", "a3"]
        q.flush()
        assert out == ["a1", "b2", "a3", "b4"]

    def test_blocker(self):
        q = OrderedMultiQueue()
        q.add_queue(QueueKey(0, "a"), lambda t, d: None)
        q.add_queue(QueueKey(0, "b"), lambda t, d: None)
        q.add(QueueKey(0, "a"), 1, "x")
        assert q.blocker == QueueKey(0, "b")

    def test_finished_queue_does_not_block(self):
        q = OrderedMultiQueue()
        out = []
        q.add_queue(QueueKey(0, "a"), lambda t, d: out.append(d))
        q.add_queue(QueueKey(0, "b"), lambda t, d: out.append(d))
        q.add(QueueKey(0, "a"), 1, "a1")
        q.mark_queue_as_finished(QueueKey(0, "b"))
        assert out == ["a1"]


class TestCollator:
    def test_global_ordering(self):
        c = Collator()
        out = []
        cb = lambda traj, sensor, t, d: out.append((traj, t))
        c.add_trajectory(0, ["scan"], cb)
        c.add_trajectory(1, ["scan"], cb)
        c.add_sensor_data(0, "scan", 5, None)
        c.add_sensor_data(1, "scan", 3, None)
        c.add_sensor_data(1, "scan", 7, None)
        c.add_sensor_data(0, "scan", 6, None)
        c.flush()
        assert [t for _, t in out] == sorted(t for _, t in out)

    def test_trajectory_collator_independent(self):
        c = TrajectoryCollator()
        out = []
        cb = lambda traj, sensor, t, d: out.append((traj, t))
        c.add_trajectory(0, ["scan"], cb)
        c.add_trajectory(1, ["scan"], cb)
        c.add_sensor_data(0, "scan", 5, None)
        # Trajectory 0 dispatches immediately; no cross-trajectory wait.
        assert out == [(0, 5)]
