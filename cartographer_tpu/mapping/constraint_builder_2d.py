"""Loop-closure constraint search [HOST orchestration + KERNEL matching].

Reference: mapping/internal/constraints/constraint_builder_2d.cc — gated,
sampled dispatch of (node, submap) scan-match tasks; per-submap matcher cache
(precomputation pyramid); fast correlative match above min_score followed by
a Gauss-Newton refine produces an INTER_SUBMAP constraint.

TPU design: the reference fans individual tasks across a thread pool
(constraint_builder_2d.cc:102-186); here all candidate pairs of a node are
batched into ONE vmapped device program (chunked to bound memory), and when
a device mesh is available the batch is sharded over its `pairs` axis with
shard_map — the multi-chip fan-out of SURVEY.md P1 as the production path.
The per-submap precomputation pyramid is cached on device.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache, partial
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

# Pairs per device program: bounds stacked-pyramid memory (a depth-7 512^2
# pyramid is ~7 MB; 16 pairs -> ~112 MB per dispatch).
_MAX_CHUNK = 16


def _match_impl(pyramid, grid, points, mask, init_vec, window,
                bnb_params, gn_params):
    found, score, pose = fast_correlative_match_2d(
        pyramid, grid, points, mask, Rigid2.from_vector(init_vec),
        bnb_params, min_score=0.0, linear_window_override=window)
    refined, _ = gauss_newton_match_2d(grid, points, mask, pose, gn_params)
    return score, refined.to_vector()


@lru_cache(maxsize=None)
def _refined_match_fn(gn_params):
    """GN refine of a BnB pose (the exact-global path's second stage)."""
    def refine(grid, pts, mask, pose_vec):
        refined, cost = gauss_newton_match_2d(
            grid, pts, mask, Rigid2.from_vector(pose_vec), gn_params)
        return refined.to_vector(), cost

    return jax.jit(refine)


@lru_cache(maxsize=None)
def _single_match_fn(bnb_params, gn_params, window):
    """Process-wide jitted ONE-pair matcher for the pipelined dispatch path:
    on a single device, one program per pair dispatched back-to-back (the
    device queue pipelines them, results stacked on device, ONE fetch per
    chunk) runs ~3.5x faster per pair than one vmapped batch-16 program —
    the batched program's working set (per-pair count images + bound
    tables) spills, serializing the whole dispatch."""
    return jax.jit(partial(_match_impl, window=window,
                           bnb_params=bnb_params, gn_params=gn_params))


@lru_cache(maxsize=None)
def _batched_match_fn(bnb_params, gn_params, window, mesh):
    """Process-wide jitted batched matcher: BnB + GN refine vmapped over the
    pairs axis, sharded over `mesh` when given. Shared across ALL
    ConstraintBuilder instances with the same options — a new trajectory on
    a serving MapBuilderServer must not recompile the matcher. jit retraces
    per (batch, points) shape; the executable cache is per shape."""
    matched = jax.vmap(partial(_match_impl, window=window,
                               bnb_params=bnb_params, gn_params=gn_params))
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        spec = P("pairs")
        # No collectives inside (pairs are independent); check_vma off so
        # the matcher's scalar while_loop carries don't need pcasts.
        matched = jax.shard_map(
            matched, mesh=mesh,
            in_specs=(spec, spec, spec, spec, spec),
            out_specs=(spec, spec), check_vma=False)
    return jax.jit(matched)


@dataclasses.dataclass
class Constraint:
    """pose_graph_interface.h Constraint: submap i <- node j relative pose."""

    submap_id: SubmapId
    node_id: NodeId
    rel: np.ndarray  # (3,) [x, y, theta]: node pose in submap frame
    translation_weight: float
    rotation_weight: float
    tag: str  # "INTRA_SUBMAP" | "INTER_SUBMAP"
    score: float = 0.0


@dataclasses.dataclass
class MatchRequest:
    """One gated (node, submap) candidate awaiting batched matching."""

    submap_id: SubmapId
    node_id: NodeId
    grid: Grid2D
    points: np.ndarray  # (n, 2)
    init: np.ndarray  # (3,) node pose estimate in the grid frame
    match_full: bool


class ConstraintBuilder2D:
    def __init__(self, options: ConstraintBuilderOptions, mesh=None,
                 multihost: bool = False):
        """`mesh` (jax.sharding.Mesh with a `pairs` axis) shards candidate
        batches across chips; None runs vmapped on the default device.

        `multihost=True` splits each request batch across the
        jax.distributed process group (requests[i] computed by process
        i % process_count on its LOCAL devices) and allgathers the raw
        match results, so every process builds the identical constraint set
        — the cross-machine analog of the reference's thread-pool fan-out
        (constraint_builder_2d.cc:102-186). Requires every process to call
        compute_constraints with the identical request sequence (synchronous
        pose-graph mode): process_allgather is a collective."""
        self._options = options
        self._mesh = mesh
        self._multihost = multihost
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
        # Start beam for full-submap (global) searches, tuned by the last
        # batch's certifying beam (see _raw_globals).
        self._global_beam_hint = self._bnb_params.beam_width
        self._pyramids: Dict[SubmapId, jnp.ndarray] = {}
        self._grids: Dict[SubmapId, Grid2D] = {}
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

    # ------------------------------------------------------------------ gating

    def begin_constraint(
        self, submap_id: SubmapId, grid: Grid2D, node_id: NodeId,
        node_points: np.ndarray, initial_grid_pose: np.ndarray,
        relative_distance: float = 0.0,
    ) -> Optional[MatchRequest]:
        """Gates for the local-window search (constraint_builder_2d.cc:77-111):
        max_constraint_distance + per-submap sampling. Returns a request for
        `compute_constraints`, or None when gated off."""
        if relative_distance > self._options.max_constraint_distance:
            return None
        with self._lock:
            sampler = self._samplers.setdefault(
                submap_id, FixedRatioSampler(self._options.sampling_ratio))
            if not sampler.pulse():
                return None
        return MatchRequest(submap_id, node_id, grid,
                            np.asarray(node_points)[:, :2],
                            np.asarray(initial_grid_pose, np.float64),
                            match_full=False)

    def begin_global_constraint(
        self, submap_id: SubmapId, grid: Grid2D, node_id: NodeId,
        node_points: np.ndarray,
    ) -> Optional[MatchRequest]:
        """Full-submap search request for global localization
        (constraint_builder_2d.cc:114-137)."""
        center = np.asarray(grid.origin) + 0.5 * grid.size * grid.resolution
        init = np.array([center[0], center[1], 0.0])
        return MatchRequest(submap_id, node_id, grid,
                            np.asarray(node_points)[:, :2], init,
                            match_full=True)

    # ------------------------------------------------------------------ API

    def maybe_add_constraint(
        self, submap_id: SubmapId, grid: Grid2D, node_id: NodeId,
        node_points: np.ndarray, initial_grid_pose: np.ndarray,
        relative_distance: float = 0.0,
    ) -> Optional[Constraint]:
        """Single-pair convenience wrapper over the batched path."""
        req = self.begin_constraint(submap_id, grid, node_id, node_points,
                                    initial_grid_pose, relative_distance)
        if req is None:
            return None
        out = self.compute_constraints([req])
        return out[0] if out else None

    def maybe_add_global_constraint(
        self, submap_id: SubmapId, grid: Grid2D, node_id: NodeId,
        node_points: np.ndarray,
    ) -> Optional[Constraint]:
        req = self.begin_global_constraint(submap_id, grid, node_id, node_points)
        if req is None:
            return None
        out = self.compute_constraints([req])
        return out[0] if out else None

    def compute_constraints(self, requests: List[MatchRequest]
                            ) -> List[Constraint]:
        """Match a batch of gated candidate pairs in as few device programs
        as possible (the P1 fan-out): requests are grouped by
        (full/local, grid size), padded to a power-of-two batch, and run
        through one vmapped — and, on a mesh, pairs-sharded — program per
        chunk. Results come back with ONE host sync per chunk.

        In multihost mode the request list splits round-robin across the
        process group, each process matches its share locally, and the raw
        (score, pose) results are allgathered so every process thresholds
        the identical set (SURVEY.md P5: the reference's cross-machine tier
        ships whole SLAM servers; here the mesh/processes split the
        numeric work itself)."""
        requests = [r for r in requests if len(r.points) > 0]
        if not requests and not self._is_multiprocess():
            return []
        if self._is_multiprocess():
            import jax
            from jax.experimental import multihost_utils as mu

            nproc = jax.process_count()
            pid = jax.process_index()
            n = len(requests)
            raw = np.zeros((max(n, 1), 4), np.float32)
            mine = list(range(pid, n, nproc))
            if mine:
                raw[mine] = self._raw_results([requests[i] for i in mine])
            # Collective: every process contributes its rows (zeros
            # elsewhere), the sum re-assembles the full result table.
            raw = np.asarray(mu.process_allgather(raw)).sum(axis=0)
            return self._constraints_from_raw(requests, raw[:n])
        return self._constraints_from_raw(requests,
                                          self._raw_results(requests))

    def _is_multiprocess(self) -> bool:
        if not self._multihost:
            return False
        import jax
        return jax.process_count() > 1

    def _raw_results(self, requests: List[MatchRequest]) -> np.ndarray:
        """(len(requests), 4) float32 [score, x, y, theta] — refined match
        results with NO thresholding (deterministic pure function of the
        request, so multihost processes can split the work).

        ALL chunks dispatch first (their programs pipeline on the device
        queue) and their results concatenate ON DEVICE into one table
        fetched with a single blocking transfer — over a tunneled chip a
        many-chunk batch costs one round-trip, not one per chunk."""
        out = np.zeros((len(requests), 4), np.float32)
        groups: Dict[int, List[int]] = {}
        global_idxs: List[int] = []
        for i, r in enumerate(requests):
            if r.match_full:
                global_idxs.append(i)
            else:
                groups.setdefault(r.grid.size, []).append(i)
        if global_idxs:
            out[global_idxs] = self._raw_globals(
                [requests[i] for i in global_idxs])
        pending = []  # (request indices, scores_dev (B,), poses_dev (B, 3))
        for idxs in groups.values():
            for s in range(0, len(idxs), _MAX_CHUNK):
                chunk = idxs[s:s + _MAX_CHUNK]
                scores, poses = self._raw_chunk([requests[i] for i in chunk])
                pending.append((chunk, scores, poses))
        if pending:
            flat = np.asarray(jnp.concatenate(
                [jnp.concatenate([s[:, None], p], axis=1)
                 for _, s, p in pending]))  # the single blocking fetch
            ofs = 0
            for chunk, s, _ in pending:
                rows = flat[ofs:ofs + s.shape[0]]
                out[chunk, 0] = rows[: len(chunk), 0]
                out[chunk, 1:] = rows[: len(chunk), 1:]
                ofs += s.shape[0]
        return out

    def _constraints_from_raw(self, requests: List[MatchRequest],
                              raw: np.ndarray) -> List[Constraint]:
        """Threshold + metrics over the raw result table (identical on every
        multihost process)."""
        constraints: List[Constraint] = []
        for r, row in zip(requests, raw):
            score = float(row[0])
            rel = np.asarray(row[1:], np.float64)
            self.score_histogram.add(score)
            if r.match_full:
                self._metric_scores_global.observe(score)
                min_score = self._options.global_localization_min_score
            else:
                self._metric_scores.observe(score)
                min_score = self._options.min_score
            if score < min_score or not np.all(np.isfinite(rel)):
                continue
            (self._metric_found_global if r.match_full
             else self._metric_found).increment()
            constraints.append(Constraint(
                submap_id=r.submap_id, node_id=r.node_id, rel=rel,
                translation_weight=self._options.loop_closure_translation_weight,
                rotation_weight=self._options.loop_closure_rotation_weight,
                tag="INTER_SUBMAP", score=score))
        return constraints

    def _raw_globals(self, reqs: List[MatchRequest]) -> np.ndarray:
        """Full-submap searches via the EXACT (certified iterative widening)
        matcher — a missed global constraint is unrecoverable, so the
        reference's exact-DFS semantics are preserved
        (fast_correlative_scan_matcher_2d.cc:210).

        WAVE-PARALLEL widening across the batch: each beam round dispatches
        the certified-match program for EVERY still-uncertified request
        back-to-back (they pipeline on the device queue), the
        scores/certificates come back in ONE stacked fetch per round, and
        only the uncertified survivors continue at the doubled beam — the
        per-request beam sequence (and therefore the result) is IDENTICAL
        to ops.bnb_2d.match_full_submap_exact's sequential loop, but a
        batch of R requests pays O(rounds) blocking round-trips instead of
        O(R * rounds). The surviving matches' GN refines pipeline the same
        way. Returns (len(reqs), 4) rows of [score, x, y, theta] (nan pose
        below threshold)."""
        import dataclasses as _dc

        from cartographer_tpu.ops.bnb_2d import _certified_match_fn

        min_score = self._options.global_localization_min_score
        max_beam = 65536
        prepped = []  # (pyramid, grid, pts_dev, mask_dev, init_dev, window)
        for r in reqs:
            pyramid, grid = self._matcher_for(r.submap_id, r.grid)
            pts_cap = 1 << math.ceil(math.log2(max(len(r.points), 16)))
            pts = np.zeros((pts_cap, 2), np.float32)
            pts[: len(r.points)] = r.points[:pts_cap]
            mask = np.zeros(pts_cap, bool)
            mask[: len(r.points)] = True
            window = 0.5 * grid.size * grid.resolution * 0.7
            center = (np.asarray(grid.origin)
                      + 0.5 * grid.size * grid.resolution)
            init = jnp.asarray([center[0], center[1], 0.0], jnp.float32)
            prepped.append((pyramid, grid, jnp.asarray(pts),
                            jnp.asarray(mask), init, window))
        n = len(reqs)
        scores = np.zeros(n, np.float32)
        poses = [None] * n  # device Rigid2 of the accepted round
        alive = list(range(n))
        # Adaptive start beam: full-submap windows essentially never certify
        # at the local-search beam width, so starting there wastes whole
        # rounds (device work AND a blocking round-trip each). Start where
        # the last batch certified; if the first round certifies everything,
        # decay the hint so the start can shrink back. The certificate makes
        # any start beam exact-equivalent — this only changes cost.
        beam = start_beam = min(max(self._bnb_params.beam_width,
                                    self._global_beam_hint), max_beam)
        max_certified = 0
        while alive:
            params = _dc.replace(self._bnb_params, beam_width=beam)
            wave = []
            for i in alive:
                pyramid, grid, pts, mask, init, window = prepped[i]
                fn = _certified_match_fn(params, min_score, window)
                wave.append(fn(pyramid, grid, pts, mask, init))
            # The round's ONE blocking fetch: [score, certified] per request.
            flat = np.asarray(jnp.stack(
                [jnp.stack([s, c.astype(jnp.float32)])
                 for _f, s, _p, c in wave]))
            nxt = []
            for i, (_f, _s, pose, _c), row in zip(alive, wave, flat):
                if row[1] >= 0.5 or beam >= max_beam:
                    scores[i] = row[0]
                    poses[i] = pose
                    max_certified = max(max_certified, beam)
                else:
                    nxt.append(i)
            alive = nxt
            beam *= 2
        if max_certified > start_beam:
            self._global_beam_hint = max_certified
        elif max_certified == start_beam:
            # Whole batch certified in round one: probe a smaller start next
            # time (at worst it costs the one round back).
            self._global_beam_hint = max(start_beam // 2,
                                         self._bnb_params.beam_width)
        out = np.full((n, 4), np.nan, np.float32)
        out[:, 0] = scores
        pending = []  # (row, refined-pose device vec)
        refine = _refined_match_fn(self._gn_params)
        for i in range(n):
            if scores[i] >= min_score:
                _pyr, grid, pts, mask, _init, _w = prepped[i]
                refined, _cost = refine(grid, pts, mask, poses[i].to_vector())
                pending.append((i, refined))
        if pending:
            stacked = np.asarray(jnp.stack([v for _i, v in pending]))
            for (i, _v), vec in zip(pending, stacked):
                out[i, 1:] = vec
        return out

    def _raw_chunk(self, group: List[MatchRequest]):
        B = len(group)
        pts_cap = 1 << math.ceil(math.log2(
            max(max(len(r.points) for r in group), 16)))
        pyramids = []
        grids = []
        for r in group:
            pyr, grid = self._matcher_for(r.submap_id, r.grid)
            pyramids.append(pyr)
            grids.append(grid)

        # Batch capacity: power of two, and a multiple of the mesh size when
        # sharding (padding lanes rerun the first request; discarded below).
        bcap = 1 << math.ceil(math.log2(max(B, 1)))
        use_mesh = (self._mesh is not None
                    and bcap >= self._mesh.devices.size)
        if not use_mesh:
            # Single device: pipelined per-pair dispatch (see
            # _single_match_fn) — results stacked ON DEVICE so the chunk
            # still costs one blocking fetch. Inputs transfer as THREE
            # stacked arrays for the whole chunk (sliced per-pair on
            # device): per-pair host->device transfers each pay a tunnel
            # round-trip, which dominated the dispatch at ~120 ms/pair.
            B = len(group)
            pts = np.zeros((B, pts_cap, 2), np.float32)
            mask = np.zeros((B, pts_cap), bool)
            inits = np.zeros((B, 3), np.float32)
            for i, r in enumerate(group):
                n = min(len(r.points), pts_cap)
                pts[i, :n] = r.points[:n]
                mask[i, :n] = True
                inits[i] = r.init
            pts_d = jnp.asarray(pts)
            mask_d = jnp.asarray(mask)
            inits_d = jnp.asarray(inits)
            fn = _single_match_fn(self._bnb_params, self._gn_params, None)
            outs = [fn(pyramids[i], grids[i], pts_d[i], mask_d[i], inits_d[i])
                    for i in range(B)]
            # Device arrays — the caller concatenates all chunks and pays
            # ONE blocking fetch for the whole batch.
            return (jnp.stack([o[0] for o in outs]),
                    jnp.stack([o[1] for o in outs]))
        m = self._mesh.devices.size
        bcap = ((bcap + m - 1) // m) * m

        def padded(items, pad_with):
            return items + [pad_with] * (bcap - len(items))

        pyramids = jnp.stack(padded(pyramids, pyramids[0]))
        grid_stack = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *padded(grids, grids[0]))
        pts = np.zeros((bcap, pts_cap, 2), np.float32)
        mask = np.zeros((bcap, pts_cap), bool)
        inits = np.zeros((bcap, 3), np.float32)
        for i, r in enumerate(group):
            n = min(len(r.points), pts_cap)
            pts[i, :n] = r.points[:n]
            mask[i, :n] = True
            inits[i] = r.init

        fn = _batched_match_fn(
            self._bnb_params, self._gn_params, None, self._mesh)
        scores, poses = fn(pyramids, grid_stack, jnp.asarray(pts),
                           jnp.asarray(mask), jnp.asarray(inits))
        # Device arrays (padding lanes discarded at the caller's single
        # batch-wide fetch).
        return scores[:B], poses[:B]

