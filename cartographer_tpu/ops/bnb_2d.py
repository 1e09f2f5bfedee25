"""Fast correlative (loop closure) 2D matching: max-pool pyramid + batched
branch-and-bound [KERNEL].

Reference: mapping/internal/2d/scan_matching/fast_correlative_scan_matcher_2d.cc —
SlidingWindowMaximum builds PrecomputationGrid2D levels of widths 2^0..2^(d-1),
then a DFS branch-and-bound over (theta, x, y) with upper-bound pruning.

TPU design: the recursion becomes a *level-synchronous beam search with
batched scoring*: all candidates of a level are scored in one gather
(bounds from the pyramid level are admissible — the max over each 2^h block
upper-bounds every leaf inside), the top `beam_width` survive, and each
splits into 4 children for the next level. This trades the DFS's exactness
guarantee for a fixed-shape, fully-parallel search; with the default beam
(4096) the bound ranking must push the true optimum below rank-4096 at some
level for a miss, which the pose-recovery tests bound empirically.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from cartographer_tpu.ops.correlative_2d import _angular_step
from cartographer_tpu.ops.grid_2d import Grid2D
from cartographer_tpu.ops.probability import UNKNOWN_PROBABILITY
from cartographer_tpu.transform.rigid import Rigid2


@dataclasses.dataclass(frozen=True)
class FastCorrelativeMatcherParams2D:
    linear_search_window: float = 7.0
    angular_search_window: float = math.radians(30.0)
    branch_and_bound_depth: int = 7
    beam_width: int = 4096
    max_scan_range: float = 30.0  # static bound for the angular candidate count

    def static_num_angles(self, resolution: float) -> int:
        step = (1.0 - 1e-3) * math.acos(
            1.0 - resolution**2 / (2.0 * self.max_scan_range**2))
        return 2 * int(math.ceil(self.angular_search_window / step)) + 1


def build_precomputation_pyramid(prob: jnp.ndarray, depth: int) -> jnp.ndarray:
    """(depth, S, S) stack; level h holds max over [x, x+2^h) x [y, y+2^h).

    Equivalent of PrecomputationGridStack2D (fast_correlative_scan_matcher_2d.cc:
    91-186) built by log-doubling instead of sliding windows: level h = max of
    level h-1 shifted by 0 and 2^(h-1) in each dim.
    """
    levels = [prob]
    current = prob
    for h in range(1, depth):
        shift = 1 << (h - 1)
        shifted_x = jnp.pad(current[shift:, :], ((0, shift), (0, 0)),
                            constant_values=UNKNOWN_PROBABILITY)
        m = jnp.maximum(current, shifted_x)
        shifted_y = jnp.pad(m[:, shift:], ((0, 0), (0, shift)),
                            constant_values=UNKNOWN_PROBABILITY)
        current = jnp.maximum(m, shifted_y)
        levels.append(current)
    return jnp.stack(levels)


def _score_candidates(level: jnp.ndarray, base_cells: jnp.ndarray,
                      a_idx: jnp.ndarray, ox: jnp.ndarray, oy: jnp.ndarray,
                      mask: jnp.ndarray, size: int) -> jnp.ndarray:
    """Mean probability of each candidate (B,) on one pyramid level.

    base_cells: (A, N, 2) per-angle discretized scan; candidates indexed by
    (a_idx, ox, oy) each (B,).
    """
    cx = base_cells[a_idx, :, 0] + ox[:, None]  # (B, N)
    cy = base_cells[a_idx, :, 1] + oy[:, None]
    in_bounds = (cx >= 0) & (cx < size) & (cy >= 0) & (cy < size)
    # 1-D linear-index gather from the flattened level: lowers to a far
    # faster TPU gather than the 2-D (cx, cy) form.
    lin = (jnp.clip(cx, 0, size - 1) * size + jnp.clip(cy, 0, size - 1))
    p = jnp.where(in_bounds, level.reshape(-1)[lin.reshape(-1)].reshape(lin.shape),
                  UNKNOWN_PROBABILITY)
    num = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask[None, :], p, 0.0), axis=-1) / num


def fast_correlative_match_2d(
    pyramid: jnp.ndarray,  # (depth, S, S) from build_precomputation_pyramid
    grid: Grid2D,  # for origin/resolution metadata (cells ignored)
    points: jnp.ndarray,  # (N, 2) node scan in its gravity-aligned frame
    mask: jnp.ndarray,  # (N,)
    initial_pose: Rigid2,  # initial estimate of scan pose in submap frame
    params: FastCorrelativeMatcherParams2D,
    min_score: float,
    linear_window_override: float = None,
    with_certificate: bool = False,
):
    """Returns (found, score, pose) — and, `with_certificate`, also
    `certified`: True when the result is PROVABLY the exact optimum.

    Certificate: every candidate the beam ever dropped had an admissible
    upper bound; if the best leaf score found is >= the maximum dropped
    bound (and >= min_score prunes), no dropped subtree can contain a
    better leaf — the beam search equals the reference's exact DFS
    (fast_correlative_scan_matcher_2d.cc:335-378) on this input.

    `linear_window_override` widens the window (MatchFullSubmap uses ~half
    the submap extent, fast_correlative_scan_matcher_2d.cc:210-225).
    """
    depth = pyramid.shape[0]
    res = grid.resolution
    size = grid.size
    num_angles = params.static_num_angles(res)
    window = params.linear_search_window if linear_window_override is None else linear_window_override
    w_cells = int(math.ceil(window / res))

    step = _angular_step(points, mask, res)
    half = (num_angles - 1) // 2
    deltas = (jnp.arange(num_angles, dtype=jnp.float32) - half) * step
    angle_valid = jnp.abs(deltas) <= params.angular_search_window + 1e-6

    rots = Rigid2(jnp.zeros((num_angles, 2)), initial_pose.rotation[None] + deltas)
    world = rots.apply(points[None, :, :]) + initial_pose.translation[None, None, :]
    base_cells = grid.world_to_cell(world)  # (A, N, 2)

    # Top level: offsets stepping 2^(depth-1) across [-w_cells, w_cells].
    top_stride = 1 << (depth - 1)
    num_off = 2 * ((w_cells + top_stride - 1) // top_stride) + 1
    offs = (jnp.arange(num_off) - num_off // 2) * top_stride - (top_stride // 2)
    a_idx, oi, oj = jnp.meshgrid(
        jnp.arange(num_angles), jnp.arange(num_off), jnp.arange(num_off),
        indexing="ij")
    a_idx = a_idx.reshape(-1)
    ox = offs[oi.reshape(-1)]
    oy = offs[oj.reshape(-1)]
    scores = _score_candidates(pyramid[depth - 1], base_cells, a_idx, ox, oy, mask, size)
    scores = jnp.where(angle_valid[a_idx], scores, -jnp.inf)

    beam = params.beam_width
    # Level-synchronous descent as one lax.scan (an unrolled level loop
    # compiles catastrophically — ~4 min at depth 7 / beam 4096). Carry is a
    # fixed beam*4 candidate set; each step keeps the top `beam`, splits each
    # into 4 children of width 2^h, and rescores on pyramid level h.
    cand = beam * 4
    k0 = min(cand, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k0)
    # Max admissible bound among candidates the truncation drops here.
    if k0 < scores.shape[0]:
        dropped_max = jax.lax.top_k(scores, k0 + 1)[0][-1]
    else:
        dropped_max = jnp.float32(-jnp.inf)
    a_idx = jnp.pad(a_idx[top_idx], (0, cand - k0))
    ox = jnp.pad(ox[top_idx], (0, cand - k0))
    oy = jnp.pad(oy[top_idx], (0, cand - k0))
    scores = jnp.pad(top_scores, (0, cand - k0), constant_values=-jnp.inf)

    def level_step(carry, h):
        a_idx, ox, oy, scores, dropped = carry
        top_scores, top_idx = jax.lax.top_k(scores, beam)
        dropped = jnp.maximum(dropped, jax.lax.top_k(scores, beam + 1)[0][-1])
        a_sel = a_idx[top_idx]
        ox_sel = ox[top_idx]
        oy_sel = oy[top_idx]
        child = (1 << h).astype(ox.dtype)
        a_new = jnp.tile(a_sel, 4)
        ox_new = jnp.concatenate([ox_sel, ox_sel + child, ox_sel, ox_sel + child])
        oy_new = jnp.concatenate([oy_sel, oy_sel, oy_sel + child, oy_sel + child])
        parent_alive = jnp.tile(top_scores > min_score, 4)
        level = pyramid[h]
        s_new = _score_candidates(level, base_cells, a_new, ox_new, oy_new, mask, size)
        s_new = jnp.where(parent_alive, s_new, -jnp.inf)
        return (a_new, ox_new, oy_new, s_new, dropped), None

    hs = jnp.arange(depth - 2, -1, -1)
    (a_idx, ox, oy, scores, dropped_max), _ = jax.lax.scan(
        level_step, (a_idx, ox, oy, scores, dropped_max), hs)

    best = jnp.argmax(scores)
    best_score = scores[best]
    found = best_score > min_score
    pose = Rigid2(
        initial_pose.translation
        + jnp.stack([ox[best].astype(jnp.float32), oy[best].astype(jnp.float32)]) * res,
        initial_pose.rotation + deltas[a_idx[best]],
    )
    if with_certificate:
        # Exact iff nothing better can hide under a dropped bound (dropped
        # subtrees below min_score are pruned by the reference's DFS too).
        certified = (best_score >= dropped_max) | (dropped_max <= min_score)
        return found, best_score, pose, certified
    return found, best_score, pose


from functools import lru_cache


@lru_cache(maxsize=None)
def _certified_match_fn(params: FastCorrelativeMatcherParams2D,
                        min_score: float, window):
    return jax.jit(lambda pyr, grid, pts, msk, init_vec: fast_correlative_match_2d(
        pyr, grid, pts, msk, Rigid2.from_vector(init_vec), params, min_score,
        linear_window_override=window, with_certificate=True))


def match_full_submap_exact(
    pyramid: jnp.ndarray,
    grid: Grid2D,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    params: FastCorrelativeMatcherParams2D,
    min_score: float,
    max_beam: int = 65536,
):
    """Exact MatchFullSubmap by iterative beam widening: rerun the
    level-synchronous search with a doubled beam until the optimality
    certificate holds (or `max_beam`), making global localization
    exact-DFS-equivalent (fast_correlative_scan_matcher_2d.cc:210-225).
    Returns (found, score, pose, certified) as host values."""
    import numpy as np

    size = grid.size
    res = grid.resolution
    window = 0.5 * size * res * 0.7
    center = np.asarray(grid.origin) + 0.5 * size * res
    init_vec = jnp.asarray([center[0], center[1], 0.0], jnp.float32)
    beam = params.beam_width
    while True:
        p = dataclasses.replace(params, beam_width=beam)
        found, score, pose, cert = _certified_match_fn(p, min_score, window)(
            pyramid, grid, points, mask, init_vec)
        if bool(cert) or beam >= max_beam:
            return bool(found), float(score), pose, bool(cert)
        beam *= 2
