"""Loop-closure constraint search [HOST orchestration + KERNEL matching].

Reference: mapping/internal/constraints/constraint_builder_2d.cc — gated,
sampled dispatch of (node, submap) scan-match tasks; per-submap matcher cache
(precomputation pyramid); fast correlative match above min_score followed by
a Gauss-Newton refine produces an INTER_SUBMAP constraint.

TPU design: the reference fans tasks across a thread pool; here each match is
one batched device program (the BnB search itself is the parallelism), the
pyramid is cached per submap on device, and `when_done` drains the pending
queue synchronously — multi-chip sharding of pending pairs lives in
cartographer_tpu.parallel.sharded_matching.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.core.config import ConstraintBuilderOptions
from cartographer_tpu.core.sampler import FixedRatioSampler
from cartographer_tpu.core.histogram import Histogram
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.ops.bnb_2d import (
    FastCorrelativeMatcherParams2D,
    build_precomputation_pyramid,
    fast_correlative_match_2d,
)
from cartographer_tpu.ops.grid_2d import Grid2D
from cartographer_tpu.ops.scan_matcher_2d import (
    GaussNewtonMatcherParams2D,
    gauss_newton_match_2d,
)
from cartographer_tpu.transform.rigid import Rigid2


@dataclasses.dataclass
class Constraint:
    """pose_graph_interface.h Constraint: submap i <- node j relative pose."""

    submap_id: SubmapId
    node_id: NodeId
    rel: np.ndarray  # (3,) [x, y, theta]: node pose in submap frame
    translation_weight: float
    rotation_weight: float
    tag: str  # "INTRA_SUBMAP" | "INTER_SUBMAP"


class ConstraintBuilder2D:
    def __init__(self, options: ConstraintBuilderOptions):
        self._options = options
        fcsm = options.fast_correlative_scan_matcher
        self._bnb_params = FastCorrelativeMatcherParams2D(
            linear_search_window=fcsm.linear_search_window,
            angular_search_window=fcsm.angular_search_window,
            branch_and_bound_depth=fcsm.branch_and_bound_depth,
            beam_width=fcsm.beam_width,
            max_scan_range=fcsm.max_scan_range)
        gn = options.ceres_scan_matcher
        self._gn_params = GaussNewtonMatcherParams2D(
            occupied_space_weight=gn.occupied_space_weight,
            translation_weight=gn.translation_weight,
            rotation_weight=gn.rotation_weight,
            num_iterations=gn.max_num_iterations,
            use_nonmonotonic_steps=gn.use_nonmonotonic_steps)
        self._samplers: Dict[SubmapId, FixedRatioSampler] = {}
        self._pyramids: Dict[SubmapId, jnp.ndarray] = {}
        self._grids: Dict[SubmapId, Grid2D] = {}
        self._pending: List[Constraint] = []
        self.score_histogram = Histogram()
        # RegisterMetrics (constraint_builder_2d.cc:318-343).
        from cartographer_tpu import metrics as m
        factory = m.GLOBAL_FACTORY
        found = factory.new_counter_family(
            "mapping_constraints_constraint_builder_2d_constraints",
            "Constraints computed")
        self._metric_found = found.add({"search_region": "local_search",
                                        "matcher": "searched"})
        self._metric_found_global = found.add({"search_region": "global_search",
                                               "matcher": "searched"})
        queue = factory.new_gauge_family(
            "mapping_constraints_constraint_builder_2d_queue_length",
            "Queue length")
        self._metric_queue = queue.add({})
        scores = factory.new_histogram_family(
            "mapping_constraints_constraint_builder_2d_scores",
            "Constraint scores built", [0.05 * i for i in range(1, 20)])
        self._metric_scores = scores.add({"search_region": "local_search"})
        self._metric_scores_global = scores.add({"search_region": "global_search"})
        import threading
        # Guards the sampler/pyramid-cache state when constraint searches run
        # on background threads (PoseGraph2D async mode).
        self._lock = threading.Lock()

        # Separate compilations for the local window and full-submap window.
        self._match_local = jax.jit(
            lambda pyr, g, p, m, iv: self._match_impl(pyr, g, p, m, iv, None))
        self._match_full = None  # built lazily (window needs the grid size)

    # ------------------------------------------------------------------ cache

    def _matcher_for(self, submap_id: SubmapId, grid: Grid2D):
        with self._lock:
            if submap_id not in self._pyramids:
                depth = self._bnb_params.branch_and_bound_depth
                self._pyramids[submap_id] = build_precomputation_pyramid(
                    grid.probability(), depth)
                self._grids[submap_id] = grid
            return self._pyramids[submap_id], self._grids[submap_id]

    def remove_submap(self, submap_id: SubmapId) -> None:
        self._pyramids.pop(submap_id, None)
        self._grids.pop(submap_id, None)
        self._samplers.pop(submap_id, None)

    # ------------------------------------------------------------------ API

    def maybe_add_constraint(
        self, submap_id: SubmapId, grid: Grid2D, node_id: NodeId,
        node_points: np.ndarray, initial_grid_pose: np.ndarray,
        relative_distance: float = 0.0,
    ) -> Optional[Constraint]:
        """Local-window constraint search (constraint_builder_2d.cc:77-111).

        `initial_grid_pose` is the node pose estimate in the submap's grid
        frame; `relative_distance` is the node-to-submap distance used for
        the max_constraint_distance gate, alongside the per-submap sampler.
        """
        if relative_distance > self._options.max_constraint_distance:
            return None
        with self._lock:
            sampler = self._samplers.setdefault(
                submap_id, FixedRatioSampler(self._options.sampling_ratio))
            if not sampler.pulse():
                return None
        return self._compute_constraint(
            submap_id, grid, node_id, node_points, initial_grid_pose,
            match_full_submap=False)

    def maybe_add_global_constraint(
        self, submap_id: SubmapId, grid: Grid2D, node_id: NodeId,
        node_points: np.ndarray,
    ) -> Optional[Constraint]:
        """Full-submap search for global localization
        (constraint_builder_2d.cc:114-137)."""
        center = np.asarray(grid.origin) + 0.5 * grid.size * grid.resolution
        init = np.array([center[0], center[1], 0.0])
        return self._compute_constraint(
            submap_id, grid, node_id, node_points, init, match_full_submap=True)

    def _compute_constraint(self, submap_id, grid, node_id, node_points,
                            initial_relative_pose, match_full_submap):
        pyramid, cached_grid = self._matcher_for(submap_id, grid)
        capacity = 1 << math.ceil(math.log2(max(len(node_points), 16)))
        pts = np.zeros((capacity, 2), np.float32)
        pts[: len(node_points)] = node_points[:, :2]
        mask = np.zeros(capacity, bool)
        mask[: len(node_points)] = True

        if match_full_submap:
            window = 0.5 * grid.size * grid.resolution * 0.7
            min_score = self._options.global_localization_min_score
            if self._match_full is None:
                self._match_full = jax.jit(
                    lambda pyr, g, p, m, iv, w=window: self._match_impl(pyr, g, p, m, iv, w))
            score, pose_vec = self._match_full(
                pyramid, cached_grid, jnp.asarray(pts), jnp.asarray(mask),
                jnp.asarray(initial_relative_pose, jnp.float32))
        else:
            min_score = self._options.min_score
            score, pose_vec = self._match_local(
                pyramid, cached_grid, jnp.asarray(pts), jnp.asarray(mask),
                jnp.asarray(initial_relative_pose, jnp.float32))

        score = float(score)
        self.score_histogram.add(score)
        if match_full_submap:
            self._metric_scores_global.observe(score)
        else:
            self._metric_scores.observe(score)
        if score < min_score:
            return None
        (self._metric_found_global if match_full_submap
         else self._metric_found).increment()
        return Constraint(
            submap_id=submap_id,
            node_id=node_id,
            rel=np.asarray(pose_vec, np.float64),
            translation_weight=self._options.loop_closure_translation_weight,
            rotation_weight=self._options.loop_closure_rotation_weight,
            tag="INTER_SUBMAP",
        )

    def _match_impl(self, pyramid, grid, points, mask, init_vec, window):
        found, score, pose = fast_correlative_match_2d(
            pyramid, grid, points, mask, Rigid2.from_vector(init_vec),
            self._bnb_params, min_score=0.0, linear_window_override=window)
        refined, _ = gauss_newton_match_2d(grid, points, mask, pose, self._gn_params)
        return score, refined.to_vector()
