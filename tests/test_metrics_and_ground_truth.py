"""Tests for metrics/ (counter/gauge/histogram + Prometheus exposition) and
ground_truth/ (relation generation + metrics)."""

import numpy as np

from cartographer_tpu.core.config import PoseGraphOptions
from cartographer_tpu.ground_truth import (
    GroundTruthRelation,
    autogenerate_ground_truth,
    compute_relations_metrics,
)
from cartographer_tpu.mapping.constraint_builder_2d import Constraint
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.pose_graph_2d import (
    PoseGraph2D,
    SubmapDataEntry,
    TrajectoryNode,
    _compose2d,
    _inverse2d,
)
from cartographer_tpu.mapping.submap_2d import Submap2D
from cartographer_tpu.metrics import (
    FamilyFactory,
    RegistryFamilyFactory,
    exponential_boundaries,
    linear_boundaries,
)
from cartographer_tpu.transform import nquat
from cartographer_tpu.transform.interpolation import TransformInterpolationBuffer


class TestMetrics:
    def test_null_objects_are_free(self):
        f = FamilyFactory()
        c = f.new_counter_family("x", "d").add({})
        c.increment()  # no-op, no error
        g = f.new_gauge_family("y", "d").add({"k": "v"})
        g.set(5.0)
        h = f.new_histogram_family("z", "d", [1.0, 2.0]).add({})
        h.observe(1.5)

    def test_registry_counts(self):
        f = RegistryFamilyFactory()
        fam = f.new_counter_family("scans_total", "processed scans")
        c = fam.add({"trajectory": "0"})
        c.increment()
        c.increment(2.0)
        assert c.value == 3.0

    def test_histogram_buckets(self):
        f = RegistryFamilyFactory()
        h = f.new_histogram_family("score", "match scores", [0.25, 0.5, 0.75]).add({})
        for v in [0.1, 0.3, 0.6, 0.9, 0.95]:
            h.observe(v)
        assert h.count == 5
        assert h.bucket_counts == [1, 1, 1, 2]

    def test_prometheus_exposition(self):
        f = RegistryFamilyFactory()
        c = f.new_counter_family("scans_total", "scans").add({"traj": "0"})
        c.increment()
        h = f.new_histogram_family("s", "scores", [0.5]).add({})
        h.observe(0.7)
        text = f.collect_prometheus()
        assert 'scans_total{traj="0"} 1.0' in text
        assert "# TYPE scans_total counter" in text
        assert 's_bucket{le="+Inf"} 1' in text
        assert "s_count 1" in text

    def test_boundaries(self):
        assert linear_boundaries(0, 10, 5) == [2, 4, 6, 8, 10]
        np.testing.assert_allclose(exponential_boundaries(1, 2, 4), [1, 2, 4, 8])


def _make_loop_graph(n_nodes=30, step=0.5):
    """A straight trajectory with one submap and one INTER constraint from
    the last node back to the submap."""
    pg = PoseGraph2D(PoseGraphOptions())
    submap = Submap2D(
        local_pose_translation=np.zeros(3),
        local_pose_rotation=np.array([1.0, 0, 0, 0]),
        insertion_finished=True)
    entry = SubmapDataEntry(submap=submap, global_pose_2d=np.zeros(3), finished=True)
    pg.submap_data.insert(SubmapId(0, 0), entry)
    for i in range(n_nodes):
        node = TrajectoryNode(
            time=1_000_000 * i,
            gravity_alignment=np.array([1.0, 0, 0, 0]),
            filtered_points=np.zeros((1, 2)),
            local_pose_translation=np.array([step * i, 0.0, 0.0]),
            local_pose_rotation=np.array([1.0, 0, 0, 0]),
            global_pose_2d=np.array([step * i, 0.0, 0.0]))
        pg.nodes.insert(NodeId(0, i), node)
        entry.node_ids.add(NodeId(0, i))
    last = NodeId(0, n_nodes - 1)
    rel = _compose2d(_inverse2d(entry.global_pose_2d),
                     pg.nodes[last].global_pose_2d)
    pg.constraints.append(Constraint(
        submap_id=SubmapId(0, 0), node_id=last, rel=rel,
        translation_weight=1e4, rotation_weight=1e5, tag="INTER_SUBMAP"))
    return pg


class TestGroundTruth:
    def test_autogenerate_gated_by_covered_distance(self):
        pg = _make_loop_graph(n_nodes=30, step=0.5)  # covered ~14.5m
        rels = autogenerate_ground_truth(pg, min_covered_distance=10.0)
        assert len(rels) == 1
        assert rels[0].covered_distance > 10.0
        rels = autogenerate_ground_truth(pg, min_covered_distance=100.0)
        assert len(rels) == 0

    def test_outlier_rejection(self):
        pg = _make_loop_graph()
        # Corrupt the constraint so it disagrees with the optimized solution.
        pg.constraints[0].rel = pg.constraints[0].rel + np.array([1.0, 0, 0])
        rels = autogenerate_ground_truth(
            pg, min_covered_distance=10.0, outlier_threshold_meters=0.15)
        assert len(rels) == 0

    def test_relation_metrics_perfect_trajectory(self):
        pg = _make_loop_graph()
        rels = autogenerate_ground_truth(pg, min_covered_distance=10.0)
        buf = TransformInterpolationBuffer()
        for (t, i), node in pg.nodes.items():
            buf.push(node.time,
                     np.array([*node.global_pose_2d[:2], 0.0]),
                     nquat.from_yaw(node.global_pose_2d[2]))
        m = compute_relations_metrics(rels, buf)
        assert m.num_relations == 1
        assert m.abs_translational_error_mean < 1e-6
        assert m.abs_rotational_error_mean < 1e-6

    def test_relation_metrics_with_error(self):
        pg = _make_loop_graph()
        rels = autogenerate_ground_truth(pg, min_covered_distance=10.0)
        buf = TransformInterpolationBuffer()
        for (t, i), node in pg.nodes.items():
            # Test trajectory drifts: scale x by 1.1.
            buf.push(node.time,
                     np.array([node.global_pose_2d[0] * 1.1, 0.0, 0.0]),
                     np.array([1.0, 0, 0, 0]))
        m = compute_relations_metrics(rels, buf)
        assert m.num_relations == 1
        np.testing.assert_allclose(m.abs_translational_error_mean, 1.45, atol=1e-5)
