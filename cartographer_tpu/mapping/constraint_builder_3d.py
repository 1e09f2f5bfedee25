"""3D loop-closure constraint search [HOST orchestration + KERNEL matching].

Reference: mapping/internal/constraints/constraint_builder_3d.cc — gated,
sampled dispatch of (node, submap) scan-match tasks over a thread pool
(:79-116), a per-submap matcher cache holding the precomputation pyramid
plus the submap rotational histogram (:150-176), and a fast correlative
match above min_score followed by a Gauss-Newton refine producing an
INTER_SUBMAP constraint (:178-277).

TPU design: the same batched production architecture as the 2D builder
(constraint_builder_2d.py): instead of one thread-pool task per pair, all
candidate pairs of a node are accumulated and dispatched as ONE vmapped
device program (chunked to bound HBM — each pair carries dual-resolution
grids + the uint8 pyramid), and when a device mesh with a `pairs` axis is
available the chunk is shard_mapped across it — the multi-chip fan-out of
SURVEY.md P1. Precomputation stacks are cached on device per submap.
"""

from __future__ import annotations

import dataclasses
import math
import threading
from functools import lru_cache, partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.core.config import ConstraintBuilderOptions
from cartographer_tpu.core.histogram import Histogram
from cartographer_tpu.core.sampler import FixedRatioSampler
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.ops.bnb_3d import (
    FastCorrelativeMatcherParams3D,
    PrecomputationStack3D,
    build_precomputation_stack_3d,
    fast_correlative_match_3d,
)
from cartographer_tpu.ops.grid_3d import Grid3D
from cartographer_tpu.ops.scan_matcher_3d import (
    GaussNewtonMatcherParams3D,
    gauss_newton_match_3d,
)
from cartographer_tpu.transform.rigid import Rigid3

# Pairs per device program. A 3D pair is far heavier than 2D (f32 dual-res
# grids + uint8 pyramid: ~10 MB at 128^3 high/96^3 low, ~90 MB at 256^3),
# so the chunk is kept smaller than the 2D builder's 16.
_MAX_CHUNK_3D = 8

# Point capacities for the matcher clouds (constraint search runs on
# heavily voxel-filtered clouds; fast_correlative_scan_matcher_3d.cc scores
# the full filtered cloud).
_HIGH_CAP = 256
_LOW_CAP = 512


def _match_impl_3d(stack, high_grid, low_grid, high_pts, high_mask,
                   low_pts, low_mask, scan_hist, submap_hist, init_vec,
                   bnb_params, gn_params, min_score):
    """BnB match + GN refine for one pair; vmapped over the pairs axis."""
    init = Rigid3(init_vec[0:3], init_vec[3:7])
    found, score, pose, rot_score, low_score = fast_correlative_match_3d(
        stack, high_grid, low_grid, high_pts, high_mask, low_pts, low_mask,
        scan_hist, submap_hist, init, bnb_params, min_score=min_score)
    refined, _ = gauss_newton_match_3d(
        high_grid, low_grid, high_pts, high_mask, low_pts, low_mask,
        pose, gn_params)
    out = jnp.concatenate([refined.translation, refined.rotation])
    return score, out, rot_score, low_score


@lru_cache(maxsize=None)
def _single_refine_fn_3d(gn_params):
    """Jitted GN refine for the (rare) full-submap match results."""
    def refine(high_grid, low_grid, hp, hm, lp, lm, pose_vec):
        refined, cost = gauss_newton_match_3d(
            high_grid, low_grid, hp, hm, lp, lm,
            Rigid3(pose_vec[0:3], pose_vec[3:7]), gn_params)
        return jnp.concatenate([refined.translation, refined.rotation]), cost
    return jax.jit(refine)


@lru_cache(maxsize=None)
def _single_match_fn_3d(bnb_params, gn_params, min_score):
    """Process-wide jitted ONE-pair 3D matcher for the pipelined dispatch
    path (single device): per-pair programs dispatched back-to-back with
    results stacked on device avoid the vmapped batch's working-set spill
    (see constraint_builder_2d._single_match_fn)."""
    return jax.jit(partial(_match_impl_3d, bnb_params=bnb_params,
                           gn_params=gn_params, min_score=min_score))


@lru_cache(maxsize=None)
def _batched_match_fn_3d(bnb_params, gn_params, min_score, mesh):
    """Process-wide jitted batched 3D matcher: BnB + GN refine vmapped over
    pairs, sharded over `mesh` when given. Shared across ALL builder
    instances with the same options (a new trajectory must not recompile);
    jit retraces per (batch, grid, points) shape bucket."""
    matched = jax.vmap(partial(_match_impl_3d, bnb_params=bnb_params,
                               gn_params=gn_params, min_score=min_score))
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        spec = P("pairs")
        matched = jax.shard_map(
            matched, mesh=mesh,
            in_specs=(spec,) * 10,
            out_specs=(spec, spec, spec, spec), check_vma=False)
    return jax.jit(matched)


@dataclasses.dataclass
class MatchResult3D:
    """One accepted inter-submap match: node pose in the GRID (local) frame
    plus the scores the reference logs (fast_correlative_scan_matcher_3d.h
    Result{score, pose_estimate, rotational_score, low_resolution_score})."""

    submap_id: SubmapId
    node_id: NodeId
    grid_t: np.ndarray  # (3,)
    grid_q: np.ndarray  # (4,)
    score: float
    rotational_score: float
    low_resolution_score: float


@dataclasses.dataclass
class MatchRequest3D:
    """One gated (node, submap) candidate awaiting batched matching.

    `match_full` requests search the WHOLE submap over the full yaw circle
    (global localization); `init_q` then carries the node's rotation
    relative to the submap (gravity-agreeing, yaw arbitrary) and `init_t`
    is unused (fast_correlative_scan_matcher_3d.cc:147-169)."""

    submap_id: SubmapId
    node_id: NodeId
    stack: PrecomputationStack3D
    high_grid: Grid3D
    low_grid: Grid3D
    high_points: np.ndarray  # (n, 3)
    low_points: np.ndarray  # (m, 3)
    scan_histogram: np.ndarray
    submap_histogram: np.ndarray
    init_t: np.ndarray  # (3,) node translation estimate in the grid frame
    init_q: np.ndarray  # (4,)
    match_full: bool = False


class ConstraintBuilder3D:
    def __init__(self, options: ConstraintBuilderOptions, mesh=None):
        """`mesh` (jax.sharding.Mesh with a `pairs` axis) shards candidate
        batches across chips; None runs vmapped on the default device."""
        self._options = options
        self._mesh = mesh
        fcsm = options.fast_correlative_scan_matcher_3d
        self._bnb_params = FastCorrelativeMatcherParams3D(
            branch_and_bound_depth=fcsm.branch_and_bound_depth,
            full_resolution_depth=fcsm.full_resolution_depth,
            min_rotational_score=fcsm.min_rotational_score,
            min_low_resolution_score=fcsm.min_low_resolution_score,
            linear_xy_search_window=fcsm.linear_xy_search_window,
            linear_z_search_window=fcsm.linear_z_search_window,
            angular_search_window=fcsm.angular_search_window)
        gn = options.ceres_scan_matcher_3d
        self._gn_params = GaussNewtonMatcherParams3D(
            occupied_space_weight_0=gn.occupied_space_weight_0,
            occupied_space_weight_1=gn.occupied_space_weight_1,
            translation_weight=gn.translation_weight,
            rotation_weight=gn.rotation_weight,
            only_optimize_yaw=gn.only_optimize_yaw,
            num_iterations=gn.max_num_iterations)
        self._samplers: Dict[SubmapId, FixedRatioSampler] = {}
        # submap id -> (stack, high Grid3D, low Grid3D, histogram) cache
        # (the reference's SubmapScanMatcher cache,
        # constraint_builder_3d.cc:150-176).
        self._matchers: Dict[SubmapId, Tuple] = {}
        self.score_histogram = Histogram()
        self.rotational_score_histogram = Histogram()
        self.low_resolution_score_histogram = Histogram()
        # RegisterMetrics (constraint_builder_3d.cc:345-390).
        from cartographer_tpu import metrics as m
        factory = m.GLOBAL_FACTORY
        found = factory.new_counter_family(
            "mapping_constraints_constraint_builder_3d_constraints",
            "Constraints computed")
        self._metric_found = found.add({"search_region": "local_search",
                                        "matcher": "searched"})
        self._metric_found_global = found.add(
            {"search_region": "global_search", "matcher": "searched"})
        scores = factory.new_histogram_family(
            "mapping_constraints_constraint_builder_3d_scores",
            "Constraint scores built", [0.05 * i for i in range(1, 20)])
        self._metric_scores = scores.add({"search_region": "local_search",
                                          "kind": "score"})
        self._metric_scores_global = scores.add(
            {"search_region": "global_search", "kind": "score"})
        self._metric_rot_scores = scores.add(
            {"search_region": "local_search", "kind": "rotational_score"})
        self._metric_low_scores = scores.add(
            {"search_region": "local_search", "kind": "low_resolution_score"})
        # Guards sampler/matcher-cache state across background threads.
        self._lock = threading.Lock()

    # ------------------------------------------------------------------ cache

    def _matcher_for(self, submap_id: SubmapId, submap):
        """Pyramid + dense-grid snapshot for a finished submap, built once
        (DispatchScanMatcherConstruction, constraint_builder_3d.cc:150-176).
        The dense crops come from the submap's paged pools on first access."""
        with self._lock:
            cached = self._matchers.get(submap_id)
        if cached is not None:
            return cached
        high = submap.high_grid
        low = submap.low_grid
        if high is None or low is None:
            return None
        stack = build_precomputation_stack_3d(
            high.probability(),
            self._bnb_params.branch_and_bound_depth,
            self._bnb_params.full_resolution_depth)
        entry = (stack, high, low,
                 np.asarray(submap.histogram, np.float32))
        with self._lock:
            # A concurrent duplicate build is idempotent; first writer wins.
            return self._matchers.setdefault(submap_id, entry)

    def remove_submap(self, submap_id: SubmapId) -> None:
        with self._lock:
            self._matchers.pop(submap_id, None)
            self._samplers.pop(submap_id, None)

    # ------------------------------------------------------------------ gating

    def begin_constraint(
        self, submap_id: SubmapId, submap, node_id: NodeId,
        high_points: np.ndarray, low_points: np.ndarray,
        scan_histogram: np.ndarray, init_t: np.ndarray, init_q: np.ndarray,
        relative_distance: float = 0.0,
    ) -> Optional[MatchRequest3D]:
        """MaybeAddConstraint gates (constraint_builder_3d.cc:79-103):
        max_constraint_distance + per-submap sampling. Returns a request
        for `compute_constraints`, or None when gated off."""
        if len(high_points) == 0:
            return None
        if relative_distance > self._options.max_constraint_distance:
            return None
        with self._lock:
            sampler = self._samplers.setdefault(
                submap_id, FixedRatioSampler(self._options.sampling_ratio))
            if not sampler.pulse():
                return None
        matcher = self._matcher_for(submap_id, submap)
        if matcher is None:
            return None
        stack, high, low, submap_hist = matcher
        return MatchRequest3D(
            submap_id=submap_id, node_id=node_id, stack=stack,
            high_grid=high, low_grid=low,
            high_points=np.asarray(high_points, np.float32)[:, :3],
            low_points=np.asarray(low_points, np.float32)[:, :3],
            scan_histogram=np.asarray(scan_histogram, np.float32),
            submap_histogram=submap_hist,
            init_t=np.asarray(init_t, np.float64),
            init_q=np.asarray(init_q, np.float64))

    def begin_global_constraint(
        self, submap_id: SubmapId, submap, node_id: NodeId,
        high_points: np.ndarray, low_points: np.ndarray,
        scan_histogram: np.ndarray, relative_q: np.ndarray,
    ) -> Optional[MatchRequest3D]:
        """Full-submap search request for 3D global localization
        (MaybeAddGlobalConstraint, constraint_builder_3d.cc:116-148): no
        distance gate, no per-submap sampler — the pose graph's global
        sampler is the only gate. `relative_q` is the node's rotation
        relative to the submap frame (yaw arbitrary, gravity shared)."""
        if len(high_points) == 0:
            return None
        matcher = self._matcher_for(submap_id, submap)
        if matcher is None:
            return None
        stack, high, low, submap_hist = matcher
        return MatchRequest3D(
            submap_id=submap_id, node_id=node_id, stack=stack,
            high_grid=high, low_grid=low,
            high_points=np.asarray(high_points, np.float32)[:, :3],
            low_points=np.asarray(low_points, np.float32)[:, :3],
            scan_histogram=np.asarray(scan_histogram, np.float32),
            submap_histogram=submap_hist,
            init_t=np.zeros(3), init_q=np.asarray(relative_q, np.float64),
            match_full=True)

    def maybe_add_global_constraint(
        self, submap_id: SubmapId, submap, node_id: NodeId,
        high_points: np.ndarray, low_points: np.ndarray,
        scan_histogram: np.ndarray, relative_q: np.ndarray,
    ) -> Optional[MatchResult3D]:
        """Single-pair convenience wrapper over the batched path."""
        req = self.begin_global_constraint(
            submap_id, submap, node_id, high_points, low_points,
            scan_histogram, relative_q)
        if req is None:
            return None
        out = self.compute_constraints([req])
        return out[0] if out else None

    # ------------------------------------------------------------------ API

    def compute_constraints(self, requests: List[MatchRequest3D]
                            ) -> List[MatchResult3D]:
        """Match a batch of gated candidate pairs in as few device programs
        as possible: requests group by grid-shape bucket, pad to a
        mesh-divisible batch, and run through one vmapped (and, on a mesh,
        pairs-sharded) program per chunk — ONE host sync per chunk.
        Full-submap (global localization) requests run one certified
        widening search each — they are rare (globally sampled) and a
        missed first cross-trajectory constraint is unrecoverable."""
        results: List[MatchResult3D] = []
        groups: Dict[Tuple[int, int], List[MatchRequest3D]] = {}
        for r in requests:
            if r.match_full:
                res = self._compute_global(r)
                if res is not None:
                    results.append(res)
                continue
            groups.setdefault(
                (r.high_grid.size, r.low_grid.size), []).append(r)
        # ALL chunks dispatch first (programs pipeline on the device queue),
        # then one concatenated device table is fetched with a single
        # blocking transfer — one round-trip for the whole batch over a
        # tunneled chip, not one per chunk.
        pending = []  # (group, scores, poses, rot_scores, low_scores) dev
        for group in groups.values():
            for i in range(0, len(group), _MAX_CHUNK_3D):
                g = group[i:i + _MAX_CHUNK_3D]
                pending.append((g, *self._compute_chunk(g)))
        if pending:
            flat = np.asarray(jnp.concatenate(
                [jnp.concatenate([s[:, None], p, r[:, None], lo[:, None]],
                                 axis=1)
                 for _, s, p, r, lo in pending]))
            ofs = 0
            for g, s, _, _, _ in pending:
                rows = flat[ofs:ofs + s.shape[0]]
                results.extend(self._results_from_arrays(
                    g, rows[:, 0], rows[:, 1:8], rows[:, 8], rows[:, 9]))
                ofs += s.shape[0]
        return results

    def _compute_global(self, r: MatchRequest3D) -> Optional[MatchResult3D]:
        """One full-submap search (ComputeConstraint with match_full_submap,
        constraint_builder_3d.cc:178-277): certified-widening BnB over the
        whole grid and yaw circle, thresholded at
        global_localization_min_score, then the same GN refine as the local
        path."""
        from cartographer_tpu.ops.bnb_3d import match_full_submap_3d_exact

        def pad_cloud(c, cap):
            pts = np.zeros((cap, 3), np.float32)
            n = min(len(c), cap)
            pts[:n] = c[:n]
            mask = np.zeros(cap, bool)
            mask[:n] = True
            return jnp.asarray(pts), jnp.asarray(mask)

        hp, hm = pad_cloud(r.high_points, _HIGH_CAP)
        lp, lm = pad_cloud(r.low_points, _LOW_CAP)
        min_score = float(self._options.global_localization_min_score)
        found, score, pose, rot_score, low_score, _cert = (
            match_full_submap_3d_exact(
                r.stack, r.high_grid, r.low_grid, hp, hm, lp, lm,
                jnp.asarray(r.scan_histogram, jnp.float32),
                jnp.asarray(r.submap_histogram, jnp.float32),
                jnp.asarray(r.init_q, jnp.float32), jnp.asarray(
                    np.array([1.0, 0, 0, 0], np.float32)),
                self._bnb_params, min_score))
        self.score_histogram.add(score)
        self._metric_scores_global.observe(score)
        if not found or score < min_score:
            return None
        refined, _ = _single_refine_fn_3d(self._gn_params)(
            r.high_grid, r.low_grid, hp, hm, lp, lm,
            jnp.concatenate([pose.translation, pose.rotation]))
        refined = np.asarray(refined)
        if not np.all(np.isfinite(refined)):
            return None
        self.rotational_score_histogram.add(rot_score)
        self.low_resolution_score_histogram.add(low_score)
        self._metric_found_global.increment()
        q = np.asarray(refined[3:7], np.float64)
        q = q / max(np.linalg.norm(q), 1e-12)
        return MatchResult3D(
            submap_id=r.submap_id, node_id=r.node_id,
            grid_t=np.asarray(refined[0:3], np.float64), grid_q=q,
            score=score, rotational_score=rot_score,
            low_resolution_score=low_score)

    def _compute_chunk(self, group: List[MatchRequest3D]):
        """Dispatch one chunk; returns DEVICE arrays
        (scores (B,), poses (B, 7), rot_scores (B,), low_scores (B,)) —
        the caller batches the fetch."""
        B = len(group)
        bcap = 1 << math.ceil(math.log2(max(B, 1)))
        use_mesh = (self._mesh is not None
                    and bcap >= self._mesh.devices.size)
        if not use_mesh:
            return self._compute_chunk_pipelined(group)
        m = self._mesh.devices.size
        bcap = ((bcap + m - 1) // m) * m

        def padded(items):
            return items + [items[0]] * (bcap - len(items))

        stacks = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *padded([r.stack for r in group]))
        highs = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *padded([r.high_grid for r in group]))
        lows = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *padded([r.low_grid for r in group]))

        def pad_clouds(clouds, cap):
            pts = np.zeros((bcap, cap, 3), np.float32)
            mask = np.zeros((bcap, cap), bool)
            for i, c in enumerate(clouds):
                n = min(len(c), cap)
                pts[i, :n] = c[:n]
                mask[i, :n] = True
            return jnp.asarray(pts), jnp.asarray(mask)

        high_pts, high_mask = pad_clouds(
            padded([r.high_points for r in group]), _HIGH_CAP)
        low_pts, low_mask = pad_clouds(
            padded([r.low_points for r in group]), _LOW_CAP)
        shist = jnp.asarray(np.stack(
            padded([r.scan_histogram for r in group])).astype(np.float32))
        subhist = jnp.asarray(np.stack(
            padded([r.submap_histogram for r in group])).astype(np.float32))
        inits = np.zeros((bcap, 7), np.float32)
        for i, r in enumerate(group):
            inits[i, 0:3] = r.init_t
            inits[i, 3:7] = r.init_q
        inits[B:, 3] = 1.0

        fn = _batched_match_fn_3d(
            self._bnb_params, self._gn_params,
            float(self._options.min_score), self._mesh)
        scores, poses, rot_scores, low_scores = fn(
            stacks, highs, lows, high_pts, high_mask, low_pts, low_mask,
            shist, subhist, jnp.asarray(inits))
        return scores[:B], poses[:B], rot_scores[:B], low_scores[:B]

    def _compute_chunk_pipelined(self, group: List[MatchRequest3D]):
        """Single device: one program per pair, dispatched back-to-back
        (device queue pipelines), results stacked ON DEVICE — the caller
        batches the fetch across chunks."""
        fn = _single_match_fn_3d(self._bnb_params, self._gn_params,
                                 float(self._options.min_score))

        def pad_cloud(c, cap):
            pts = np.zeros((cap, 3), np.float32)
            n = min(len(c), cap)
            pts[:n] = c[:n]
            mask = np.zeros(cap, bool)
            mask[:n] = True
            return pts, mask

        outs = []
        for r in group:
            hp, hm = pad_cloud(r.high_points, _HIGH_CAP)
            lp, lm = pad_cloud(r.low_points, _LOW_CAP)
            init = np.concatenate([
                np.asarray(r.init_t, np.float32),
                np.asarray(r.init_q, np.float32)])
            outs.append(fn(
                r.stack, r.high_grid, r.low_grid, hp, hm, lp, lm,
                np.asarray(r.scan_histogram, np.float32),
                np.asarray(r.submap_histogram, np.float32), init))
        return tuple(jnp.stack([o[k] for o in outs]) for k in range(4))

    def _results_from_arrays(self, group, scores, poses, rot_scores,
                             low_scores) -> List[MatchResult3D]:
        min_score = self._options.min_score
        out = []
        for i, r in enumerate(group):
            score = float(scores[i])
            self.score_histogram.add(score)
            self._metric_scores.observe(score)
            self._metric_rot_scores.observe(float(rot_scores[i]))
            self._metric_low_scores.observe(float(low_scores[i]))
            if score <= min_score or not np.all(np.isfinite(poses[i])):
                continue
            self.rotational_score_histogram.add(float(rot_scores[i]))
            self.low_resolution_score_histogram.add(float(low_scores[i]))
            self._metric_found.increment()
            q = np.asarray(poses[i, 3:7], np.float64)
            q = q / max(np.linalg.norm(q), 1e-12)
            out.append(MatchResult3D(
                submap_id=r.submap_id, node_id=r.node_id,
                grid_t=np.asarray(poses[i, 0:3], np.float64), grid_q=q,
                score=score, rotational_score=float(rot_scores[i]),
                low_resolution_score=float(low_scores[i])))
        return out
