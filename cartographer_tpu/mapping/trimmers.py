"""Pose graph trimmers.

Reference: mapping/pose_graph_trimmer.{h,cc} — the Trimmable handle API and
PureLocalizationTrimmer (keep only the last N submaps of a trajectory, the
mechanism behind pure-localization mode, map_builder.cc:56-73) — plus
internal/2d/overlapping_submaps_trimmer_2d.cc (trim submaps fully covered by
fresher ones).
"""

from __future__ import annotations

from typing import List, Set

import numpy as np

from cartographer_tpu.mapping.id import SubmapId


class PoseGraphTrimmer:
    def trim(self, trimmable) -> None:
        raise NotImplementedError

    def is_finished(self) -> bool:
        return False


class PureLocalizationTrimmer(PoseGraphTrimmer):
    """Keep the last `max_submaps_to_keep` submaps of one trajectory."""

    def __init__(self, trajectory_id: int, max_submaps_to_keep: int):
        self._trajectory_id = trajectory_id
        self._max = max_submaps_to_keep
        self._finished = False

    def trim(self, trimmable) -> None:
        submap_ids = trimmable.get_submap_ids(self._trajectory_id)
        for sid in submap_ids[: max(0, len(submap_ids) - self._max)]:
            trimmable.trim_submap(sid)
        if self._max == 0:
            self._finished = True

    def is_finished(self) -> bool:
        return self._finished


class OverlappingSubmapsTrimmer2D(PoseGraphTrimmer):
    """Trim finished submaps whose known area is covered by
    `fresh_submaps_count` fresher submaps (overlapping_submaps_trimmer_2d.cc).

    Coverage is evaluated on a coarse world grid: a submap is prunable when
    at least (1 - epsilon) of its known cells are also covered by fresher
    submaps and the remaining exclusive area is below min_covered_area m^2.
    """

    def __init__(self, fresh_submaps_count: int, min_covered_area: float,
                 min_added_submaps_count: int):
        self._fresh = fresh_submaps_count
        self._min_area = min_covered_area
        self._min_added = min_added_submaps_count
        self._num_processed = 0

    def trim(self, trimmable) -> None:
        all_ids = trimmable.get_all_submap_ids()
        if len(all_ids) < self._min_added + self._fresh:
            return
        cell_size = 0.5  # coarse coverage raster (meters)
        coverage = {}
        # Newest submaps claim cells first.
        for order, sid in enumerate(reversed(all_ids)):
            cells = trimmable.get_submap_coverage_cells(sid, cell_size)
            for c in cells:
                coverage.setdefault(c, []).append(order)
        to_trim: List[SubmapId] = []
        for order, sid in enumerate(reversed(all_ids)):
            if order < self._fresh:
                continue  # always keep the freshest
            cells = trimmable.get_submap_coverage_cells(sid, cell_size)
            if not cells:
                continue
            exclusive = sum(
                1 for c in cells
                if sum(1 for o in coverage.get(c, []) if o < order) < self._fresh)
            if exclusive * cell_size * cell_size < self._min_area:
                to_trim.append(sid)
        for sid in to_trim:
            trimmable.trim_submap(sid)
