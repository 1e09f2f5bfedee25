"""Pre-matched local-SLAM results for tier-2 (uplink) pose-graph-only SLAM.

Reference: mapping/internal/local_slam_result_data.h,
mapping/internal/2d/local_slam_result_2d.cc,
mapping/internal/3d/local_slam_result_3d.cc and
mapping/internal/submap_controller.{h,cc} — a lower-tier server uploads node
data plus incremental submap state; the upper tier replays the submaps via a
SubmapController and feeds the node straight into the pose graph (no local
matching), so the uplink runs exactly the cross-robot global-SLAM half.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class SubmapRecord:
    """Serialized incremental submap state (proto::Submap analog).

    `grid` / `high_grid` / `low_grid` are serialization-format dicts
    (io/serialization grid records) and are present only when the submap is
    finished — the reference also sends the probability grid up only then
    (cloud/internal/sensor/serialization.cc:93-99).
    """

    trajectory_id: int
    submap_index: int
    local_pose_translation: np.ndarray  # (3,)
    local_pose_rotation: np.ndarray  # (4,)
    num_range_data: int
    insertion_finished: bool
    grid: Optional[dict] = None  # 2D
    high_grid: Optional[dict] = None  # 3D
    low_grid: Optional[dict] = None  # 3D
    histogram: Optional[np.ndarray] = None  # 3D rotational histogram


@dataclasses.dataclass
class LocalSlamResultData:
    """One uploaded local-SLAM result: node data + the insertion submaps'
    state (mapping/internal/local_slam_result_data.h)."""

    time: int
    node: dict  # node payload (2D: gravity_alignment/cloud/pose; 3D adds clouds+histogram)
    submaps: List[SubmapRecord]
    is_3d: bool = False


def is_new_submap(data: LocalSlamResultData) -> bool:
    """IsNewSubmap (local_trajectory_uploader.cc:52-56): the last insertion
    submap has seen exactly one scan — a safe point to resume uploading
    after recovery because the tier-2 SubmapController can recreate it."""
    return bool(data.submaps) and data.submaps[-1].num_range_data == 1


class SubmapController2D:
    """Replays incremental submap records into tier-2 Submap2D replicas
    (mapping/internal/submap_controller.h)."""

    def __init__(self):
        self._submaps: Dict[Tuple[int, int], object] = {}

    def update_submap(self, rec: SubmapRecord) -> Tuple[Optional[object], bool]:
        """Returns (submap, newly_finished); submap is None when the record
        describes a partially-filled submap we never saw the start of
        (submap_controller.cc: "Refusing to create partially filled submap")."""
        from cartographer_tpu.mapping.submap_2d import Submap2D

        key = (rec.trajectory_id, rec.submap_index)
        existing = self._submaps.get(key)
        if existing is None:
            if rec.num_range_data != 1:
                return None, False
            submap = Submap2D(
                local_pose_translation=np.asarray(rec.local_pose_translation, np.float64),
                local_pose_rotation=np.asarray(rec.local_pose_rotation, np.float64),
                num_range_data=rec.num_range_data,
                insertion_finished=False)
            self._submaps[key] = submap
            return submap, False
        existing.num_range_data = rec.num_range_data
        newly_finished = rec.insertion_finished and not existing.insertion_finished
        if newly_finished:
            from cartographer_tpu.io.serialization import un_grid2d

            existing.grid = un_grid2d(rec.grid)
            existing.insertion_finished = True
            # Finished submaps never update again; drop the handle so the
            # controller holds only unfinished submaps (reference Trim).
            del self._submaps[key]
        return existing, newly_finished


class SubmapController3D:
    def __init__(self):
        self._submaps: Dict[Tuple[int, int], object] = {}

    def update_submap(self, rec: SubmapRecord) -> Tuple[Optional[object], bool]:
        from cartographer_tpu.mapping.submap_3d import Submap3D

        key = (rec.trajectory_id, rec.submap_index)
        existing = self._submaps.get(key)
        if existing is None:
            if rec.num_range_data != 1:
                return None, False
            submap = Submap3D(
                local_pose_translation=np.asarray(rec.local_pose_translation, np.float64),
                local_pose_rotation=np.asarray(rec.local_pose_rotation, np.float64),
                num_range_data=rec.num_range_data,
                insertion_finished=False)
            self._submaps[key] = submap
            return submap, False
        existing.num_range_data = rec.num_range_data
        newly_finished = rec.insertion_finished and not existing.insertion_finished
        if newly_finished:
            from cartographer_tpu.io.serialization import _un_grid3d

            existing.high_grid = _un_grid3d(rec.high_grid)
            existing.low_grid = _un_grid3d(rec.low_grid)
            if rec.histogram is not None:
                existing.histogram = np.asarray(rec.histogram, np.float32)
            existing.insertion_finished = True
            del self._submaps[key]
        return existing, newly_finished


def build_local_slam_result(trajectory_id: int, insertion_result,
                            starting_submap_index: int,
                            is_3d: bool) -> Tuple[LocalSlamResultData, int]:
    """Tier-1 side: package an InsertionResult for upload
    (cloud/internal/sensor/serialization.cc CreateSensorDataForLocalSlamResult).

    Insertion submaps get indices starting_submap_index + k; the caller's
    counter advances when the front (matching) submap finished
    (map_builder_server.cc:199-201). Returns (data, new_starting_index).
    """
    from cartographer_tpu.io.serialization import grid2d_record, _grid3d_record

    ir = insertion_result
    if is_3d:
        node = {
            "time": ir.time,
            "gravity_alignment": np.asarray(ir.gravity_alignment, np.float64),
            "high_res_cloud": np.asarray(ir.high_res_cloud, np.float32),
            "low_res_cloud": np.asarray(ir.low_res_cloud, np.float32),
            "scan_histogram": np.asarray(ir.scan_histogram, np.float32),
            "local_pose_translation": np.asarray(ir.local_pose_translation, np.float64),
            "local_pose_rotation": np.asarray(ir.local_pose_rotation, np.float64),
        }
    else:
        node = {
            "time": ir.time,
            "gravity_alignment": np.asarray(ir.gravity_alignment, np.float64),
            "filtered_points": np.asarray(
                ir.filtered_gravity_aligned_point_cloud.to_numpy(), np.float64),
            "local_pose_translation": np.asarray(ir.local_pose_translation, np.float64),
            "local_pose_rotation": np.asarray(ir.local_pose_rotation, np.float64),
        }
    records: List[SubmapRecord] = []
    for k, submap in enumerate(ir.insertion_submaps):
        rec = SubmapRecord(
            trajectory_id=trajectory_id,
            submap_index=starting_submap_index + k,
            local_pose_translation=np.asarray(submap.local_pose_translation, np.float64),
            local_pose_rotation=np.asarray(submap.local_pose_rotation, np.float64),
            num_range_data=submap.num_range_data,
            insertion_finished=submap.insertion_finished)
        if submap.insertion_finished:
            if is_3d:
                rec.high_grid = _grid3d_record(submap.high_grid)
                rec.low_grid = _grid3d_record(submap.low_grid)
                if submap.histogram is not None:
                    rec.histogram = np.asarray(submap.histogram, np.float32)
            else:
                rec.grid = grid2d_record(submap.grid)
        records.append(rec)
    new_start = starting_submap_index
    if ir.insertion_submaps and ir.insertion_submaps[0].insertion_finished:
        new_start += 1
    return LocalSlamResultData(
        time=ir.time, node=node, submaps=records, is_3d=is_3d), new_start
