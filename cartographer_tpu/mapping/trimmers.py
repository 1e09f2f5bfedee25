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
    """overlapping_submaps_trimmer_2d.cc, full semantics:

    1. Per-submap freshness = timestamp of the latest INTRA-constraint node
       (ComputeSubmapFreshness).
    2. Every known cell of every finished submap is transformed to the
       global frame at submap resolution and added to a coverage map
       (AddSubmapsToSubmapCoverageGrid2D).
    3. Per coverage cell, only the `fresh_submaps_count` freshest submaps
       score a covered cell (FindSubmapIdsToTrim).
    4. Submaps with fewer than min_covered_area / resolution^2 covered
       cells are trimmed.
    Runs only after `min_added_submaps_count` new submaps since last trim.
    """

    def __init__(self, fresh_submaps_count: int, min_covered_area: float,
                 min_added_submaps_count: int):
        self._fresh = fresh_submaps_count
        self._min_area = min_covered_area
        self._min_added = min_added_submaps_count
        self._current_submap_count = 0

    def trim(self, pose_graph) -> None:
        num_submaps = len(pose_graph.submap_data)
        if num_submaps - self._current_submap_count <= self._min_added:
            return

        # 1. Freshness: latest intra-constraint node time per submap.
        latest_node: dict = {}
        for c in pose_graph.constraints:
            if c.tag != "INTRA_SUBMAP":
                continue
            nid = (c.node_id.trajectory_id, c.node_id.node_index)
            cur = latest_node.get(c.submap_id)
            if cur is None or nid > cur:
                latest_node[c.submap_id] = nid
        freshness = {}
        from cartographer_tpu.mapping.id import NodeId
        for sid, (nt, ni) in latest_node.items():
            node_id = NodeId(nt, ni)
            if sid in pose_graph.submap_data and node_id in pose_graph.nodes:
                freshness[sid] = pose_graph.nodes[node_id].time

        # 2. Coverage map at submap resolution, in the global frame.
        coverage: dict = {}
        all_ids: Set[SubmapId] = set()
        resolution = None
        for (t, i), entry in pose_graph.submap_data.items():
            sid = SubmapId(t, i)
            if sid not in freshness or not entry.finished:
                continue
            submap = entry.submap
            if submap.grid is None:
                continue
            grid = submap.grid
            resolution = grid.resolution
            known = np.asarray(grid.known)
            ii, jj = np.nonzero(known)
            if len(ii) == 0:
                continue
            all_ids.add(sid)
            centers = (np.stack([ii, jj], -1) + 0.5) * grid.resolution \
                + np.asarray(grid.origin)
            # local -> global: global_pose * local_submap_pose^-1 * center.
            from cartographer_tpu.transform import nquat
            lp = submap.local_pose_translation
            yaw_l = nquat.get_yaw(submap.local_pose_rotation)
            g = entry.global_pose_2d
            # rel = R(-yaw_l) (center - lp)
            c_, s_ = np.cos(-yaw_l), np.sin(-yaw_l)
            rel = (centers - lp[:2]) @ np.array([[c_, s_], [-s_, c_]],
                                                np.float64).T
            cg, sg = np.cos(g[2]), np.sin(g[2])
            world = rel @ np.array([[cg, sg], [-sg, cg]], np.float64) \
                + g[:2]
            cell_ids = np.round(world / grid.resolution).astype(np.int64)
            time = freshness[sid]
            for key in map(tuple, np.unique(cell_ids, axis=0)):
                coverage.setdefault(key, []).append((time, sid))

        if resolution is None:
            return
        # 3/4. Count cells won by each submap among the freshest `fresh`.
        covered_count: dict = {}
        for entries in coverage.values():
            entries.sort(key=lambda e: e[0], reverse=True)
            for _, sid in entries[: self._fresh]:
                covered_count[sid] = covered_count.get(sid, 0) + 1
        min_cells = int(self._min_area / resolution**2)
        keep = {sid for sid, n in covered_count.items() if n >= min_cells}
        to_trim = sorted(all_ids - keep)
        # Reference: the counter reflects the post-trim size
        # (overlapping_submaps_trimmer_2d.cc Trim).
        self._current_submap_count = num_submaps - len(to_trim)
        for sid in to_trim:
            pose_graph.trim_submap(sid)
