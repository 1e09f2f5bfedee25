"""OverlappingSubmapsTrimmer2D (overlapping_submaps_trimmer_2d.cc): trim
finished submaps whose area is covered by fresher ones."""

import numpy as np
import jax.numpy as jnp

from cartographer_tpu.core.config import PoseGraphOptions
from cartographer_tpu.mapping.constraint_builder_2d import Constraint
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.pose_graph_2d import (
    PoseGraph2D,
    SubmapDataEntry,
    TrajectoryNode,
)
from cartographer_tpu.mapping.submap_2d import Submap2D
from cartographer_tpu.mapping.trimmers import OverlappingSubmapsTrimmer2D
from cartographer_tpu.ops.grid_2d import Grid2D


def make_submap(center, known_half_m=1.0, res=0.1, size=64):
    grid = Grid2D.create(size, res, jnp.asarray(center, jnp.float32))
    known = np.zeros((size, size), bool)
    h = int(known_half_m / res)
    known[size // 2 - h: size // 2 + h, size // 2 - h: size // 2 + h] = True
    grid = Grid2D(log_odds=jnp.full((size, size), 0.4, jnp.float32),
                  known=jnp.asarray(known), origin=grid.origin,
                  resolution=res)
    return Submap2D(
        local_pose_translation=np.array([center[0], center[1], 0.0]),
        local_pose_rotation=np.array([1.0, 0, 0, 0]),
        num_range_data=10, insertion_finished=True, grid=grid)


def add_submap(pg, index, center, time):
    sid = SubmapId(0, index)
    submap = make_submap(center)
    pg.submap_data.insert(sid, SubmapDataEntry(
        submap=submap,
        global_pose_2d=np.array([center[0], center[1], 0.0]),
        finished=True))
    nid = NodeId(0, index)
    pg.nodes.insert(nid, TrajectoryNode(
        time=time, gravity_alignment=np.array([1.0, 0, 0, 0]),
        filtered_points=np.zeros((4, 2)),
        local_pose_translation=np.array([center[0], center[1], 0.0]),
        local_pose_rotation=np.array([1.0, 0, 0, 0]),
        global_pose_2d=np.array([center[0], center[1], 0.0])))
    pg.constraints.append(Constraint(
        submap_id=sid, node_id=nid,
        rel=np.zeros(3), translation_weight=1.0, rotation_weight=1.0,
        tag="INTRA_SUBMAP"))
    return sid


def test_covered_stale_submap_is_trimmed():
    pg = PoseGraph2D(PoseGraphOptions())
    # Three co-located submaps (increasing freshness) + one far away.
    s0 = add_submap(pg, 0, (0.0, 0.0), time=1_000_000)
    s1 = add_submap(pg, 1, (0.0, 0.0), time=2_000_000)
    s2 = add_submap(pg, 2, (0.0, 0.0), time=3_000_000)
    s3 = add_submap(pg, 3, (10.0, 0.0), time=1_500_000)

    trimmer = OverlappingSubmapsTrimmer2D(
        fresh_submaps_count=2, min_covered_area=2.0,
        min_added_submaps_count=2)
    trimmer.trim(pg)
    ids = {SubmapId(t, i) for (t, i), _ in pg.submap_data.items()}
    # s0 is fully covered by the two fresher co-located submaps -> trimmed;
    # the far submap keeps its exclusive area.
    assert s0 not in ids
    assert {s1, s2, s3} <= ids


def test_min_added_gate():
    pg = PoseGraph2D(PoseGraphOptions())
    add_submap(pg, 0, (0.0, 0.0), time=1_000_000)
    add_submap(pg, 1, (0.0, 0.0), time=2_000_000)
    trimmer = OverlappingSubmapsTrimmer2D(
        fresh_submaps_count=1, min_covered_area=2.0,
        min_added_submaps_count=5)
    trimmer.trim(pg)  # gate: not enough new submaps since last trim
    assert len(pg.submap_data) == 2


def test_rotated_global_pose_coverage():
    """Coverage must be computed in the GLOBAL frame: a submap whose global
    pose was rotated/moved by optimization covers its optimized location."""
    pg = PoseGraph2D(PoseGraphOptions())
    s0 = add_submap(pg, 0, (0.0, 0.0), time=1_000_000)
    s1 = add_submap(pg, 1, (0.0, 0.0), time=2_000_000)
    # Move s0's global pose far away: it no longer overlaps s1 -> kept.
    pg.submap_data[s0].global_pose_2d = np.array([50.0, 0.0, 0.5])
    trimmer = OverlappingSubmapsTrimmer2D(
        fresh_submaps_count=1, min_covered_area=2.0,
        min_added_submaps_count=1)
    trimmer.trim(pg)
    ids = {SubmapId(t, i) for (t, i), _ in pg.submap_data.items()}
    assert {s0, s1} <= ids
