"""Fast correlative (loop closure) 2D matching: max-pool pyramid + batched
branch-and-bound [KERNEL].

Reference: mapping/internal/2d/scan_matching/fast_correlative_scan_matcher_2d.cc —
SlidingWindowMaximum builds PrecomputationGrid2D levels of widths 2^0..2^(d-1),
then a DFS branch-and-bound over (theta, x, y) with upper-bound pruning.

TPU design, two interchangeable strategies over the same search tree:

- "dense" (TPU production path, `_match_dense`): TPU gathers execute
  near-serially, so instead of descending from the pyramid top, COMPLETE
  admissible bounds for every level-2 node of every angle are computed
  gather-free on the MXU — per-angle coarse count images (one-hot matmuls)
  cross-correlated with a block-max bound table in one grouped conv — and
  only the top-K surviving regions descend levels 1 and 0 with the exact
  gather scorer. Completeness above level 2 means no pruning risk there at
  all; profiled ~12x faster than the beam path on v5e (15 ms vs 177 ms per
  4 m / 30 deg match at 512^2).

- "beam" (CPU default, and the executable specification): a
  *level-synchronous beam search with batched scoring* — all candidates of
  a level are scored in one gather (bounds from the pyramid level are
  admissible: the max over each 2^h block upper-bounds every leaf inside),
  the top `beam_width` survive, and each splits into 4 children.

Both report an optimality certificate (best leaf >= max dropped bound =>
equal to the reference's exact DFS on that input); `match_full_submap_exact`
widens until certified.
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
    method: str = "auto",
):
    """Returns (found, score, pose) — and, `with_certificate`, also
    `certified`: True when the result is PROVABLY the exact optimum.

    Two interchangeable search strategies over the same (theta, x, y) tree:

    - "dense" (TPU default): COMPLETE admissible bounds for every level-2
      node of every angle, computed gather-free as one MXU cross-correlation
      of per-angle coarse count images with a block-max bound table (TPU
      gathers execute near-serially — the level-synchronous gather descent
      profiled 177 ms/match vs ~10 ms for this formulation on v5e); then a
      two-level gather descent on the top `beam_width // 8` surviving
      regions only.
    - "beam" (CPU default): level-synchronous beam descent from the pyramid
      top (the original formulation; cheaper at the small windows/grids CPU
      tests use, and the executable specification of the tree semantics).

    Certificate: every candidate either search ever dropped had an
    admissible upper bound; if the best leaf score found is >= the maximum
    dropped bound (and >= min_score prunes), no dropped subtree can contain
    a better leaf — the search equals the reference's exact DFS
    (fast_correlative_scan_matcher_2d.cc:335-378) on this input.

    `linear_window_override` widens the window (MatchFullSubmap uses ~half
    the submap extent, fast_correlative_scan_matcher_2d.cc:210-225).
    """
    if method == "auto":
        method = "dense" if jax.default_backend() == "tpu" else "beam"
    if method == "dense" and (grid.size % 4 != 0 or pyramid.shape[0] < 2):
        # Block pooling needs 4-aligned grids, and the dense descent reads
        # pyramid[1] (branch_and_bound_depth == 1 has no level 1).
        method = "beam"
    if method == "dense":
        return _match_dense(pyramid, grid, points, mask, initial_pose, params,
                            min_score, linear_window_override, with_certificate)
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


def _match_dense(pyramid, grid, points, mask, initial_pose, params,
                 min_score, linear_window_override, with_certificate):
    """Dense-bounds variant of the fast correlative matcher [KERNEL].

    Stage A computes an EXACT admissible upper bound for every LEVEL-2 tree
    node (all angles x all 4-cell-aligned offsets in the window) with zero
    gathers: per angle a coarse count image (one-hot matmul over the scan's
    4-cell blocks, see ops/onehot.py) cross-correlated with a block-max
    bound table of the grid — one grouped conv on the MXU. Completeness at
    level 2 means the only bound-truncations in the whole search are the
    top-K region selection and the level-1 beam. Stage B descends the
    surviving regions through levels 1 and 0 with the exact gather scorer
    (~1M gathers vs the beam path's ~24M; TPU gathers execute
    near-serially). Level 2 is the sweet spot: a level-1 dense conv's
    bigger kernel lowers ~100x worse on the MXU (profiled), and level 3+
    bounds are so loose the survivor set degrades.

    Bound admissibility: D[i, j] = max prob over cells [4i, 4i+8) x
    [4j, 4j+8) >= any leaf under the level-2 node at offset 4(k - nl)
    (the node's leaves span < 8 cells from the block base in each dim);
    bf16 rounding is forced UPWARD so quantization cannot break it. The
    bound table carries one extra block at the low edge (index -1): a node
    anchored just below cell 0 still has in-map leaves in [0, 4), so its
    bound is max(UNKNOWN, block 0) — pure UNKNOWN padding there would
    under-bound (all stored probabilities are >= UNKNOWN).

    Selection is hierarchical (per-angle top-m, then global top-K over the
    A*m pool) because a flat vmapped top_k over the A*W^2 bound tensor
    sorts millions of elements per pair (~150 ms for 16 pairs vs ~2 ms
    hierarchical); all truncations feed the certificate's
    max-dropped-bound.
    """
    res = grid.resolution
    size = grid.size
    num_angles = params.static_num_angles(res)
    window = (params.linear_search_window if linear_window_override is None
              else linear_window_override)
    w_cells = int(math.ceil(window / res))
    nl = -(-w_cells // 4)  # level-2 window half-width, coarse units
    sc = size // 4
    # Extended coarse index space [-nl-1, sc+nl): one extra low-side block
    # because a point block b = -nl-1 combined with offset k = nl lands on
    # bound index -1, whose node still has in-map leaves.
    ext = sc + 2 * nl + 1
    num_off = 2 * nl + 1

    step = _angular_step(points, mask, res)
    half = (num_angles - 1) // 2
    deltas = (jnp.arange(num_angles, dtype=jnp.float32) - half) * step
    angle_valid = jnp.abs(deltas) <= params.angular_search_window + 1e-6
    rots = Rigid2(jnp.zeros((num_angles, 2)), initial_pose.rotation[None] + deltas)
    world = rots.apply(points[None, :, :]) + initial_pose.translation[None, None, :]
    base_cells = grid.world_to_cell(world)  # (A, N, 2)
    num_valid = jnp.maximum(jnp.sum(mask), 1).astype(jnp.float32)

    # --- Stage A: dense level-2 bounds --------------------------------
    cc = (base_cells >> 2) + nl + 1  # coarse cells in extended space
    inx = (cc[..., 0] >= 0) & (cc[..., 0] < ext)
    iny = (cc[..., 1] >= 0) & (cc[..., 1] < ext)
    inr = inx & iny & mask[None, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (num_angles, points.shape[0], ext), 2)
    P = ((iota == cc[..., 0:1]) & inr[..., None]).astype(jnp.bfloat16)
    Q = ((iota == cc[..., 1:2]) & inr[..., None]).astype(jnp.bfloat16)
    # Counts accumulate exactly in f32, then round UP into bf16: a
    # nearest-rounded bf16 count > 256 could round DOWN and under-compute a
    # Stage-A bound, unsoundly breaking the optimality certificate.
    C = jnp.einsum("ans,anr->asr", P, Q, preferred_element_type=jnp.float32)
    C = (C * (1.0 + 2.0 ** -7)).astype(jnp.bfloat16)
    oob = num_valid - jnp.sum(inr, axis=-1).astype(jnp.float32)  # (A,)

    prob = pyramid[0]
    d = prob.reshape(sc, 4, sc, 4).max(axis=(1, 3))  # 4x4 block max
    # Pad one block on BOTH sides before the sliding max: bound index -1
    # (nodes straddling the low map edge) = max(UNKNOWN, block 0).
    dpad1 = jnp.pad(d, ((1, 1), (1, 1)), constant_values=UNKNOWN_PROBABILITY)
    d2 = jnp.maximum(jnp.maximum(dpad1[:-1, :-1], dpad1[1:, :-1]),
                     jnp.maximum(dpad1[:-1, 1:], dpad1[1:, 1:]))  # 2x2 sliding
    # Round UP into bf16 so the bound stays admissible.
    d2 = (d2 * (1.0 + 2.0 ** -7)).astype(jnp.bfloat16)
    # dp[j] = D[j - 2nl - 1]; correlation index = cc + ko = (b + nl + 1) + ko
    # -> bound index b + (ko - nl) for ko in [0, 2nl].
    dp = jnp.pad(d2, 2 * nl, constant_values=UNKNOWN_PROBABILITY)
    # The cross-correlation raw[a, kx, ky] = sum_{s,r} C[a,s,r]*dp[s+kx,r+ky]
    # is computed as num_off MATMULS (one per kx row, lax.scan) instead of a
    # conv: XLA lowers an ext x ext-kernel grouped conv ~1000x worse than
    # the identical (A, ext^2) @ (ext^2, num_off) contraction (measured
    # 33.7 ms -> 0.03 ms at the production 7 m window on v5e; bit-identical
    # outputs, f32 accumulation preserved).
    Cf = C.reshape(num_angles, ext * ext)
    ky_idx = jnp.arange(ext)[:, None] + jnp.arange(num_off)[None, :]

    def _bounds_row(_, kx):
        rows = jax.lax.dynamic_slice_in_dim(dp, kx, ext, 0)
        dp2 = rows[:, ky_idx]  # (ext, ext, num_off): dp[kx+s, r+ky]
        return None, jnp.dot(Cf, dp2.reshape(ext * ext, num_off),
                             preferred_element_type=jnp.float32)

    _, raw_rows = jax.lax.scan(_bounds_row, None, jnp.arange(num_off))
    raw = raw_rows.transpose(1, 0, 2)  # (A, num_off, num_off)
    bounds = (raw + (UNKNOWN_PROBABILITY * oob)[:, None, None]) / num_valid
    bounds = jnp.where(angle_valid[:, None, None], bounds, -jnp.inf)

    # --- Stage B: hierarchical top-K regions -> leaf evaluation --------
    cells = num_off * num_off
    k2 = min(max(params.beam_width // 8, 256), num_angles * cells)
    m = min(cells, max(8, -(-2 * k2 // num_angles)))
    pa_vals, pa_idx = jax.lax.top_k(bounds.reshape(num_angles, cells),
                                    min(m + 1, cells))
    if pa_vals.shape[1] > m:
        dropped_max = jnp.max(pa_vals[:, m])
        pa_vals = pa_vals[:, :m]
        pa_idx = pa_idx[:, :m]
    else:
        dropped_max = jnp.float32(-jnp.inf)
    pool = pa_vals.reshape(-1)  # (A * m)
    kk = min(k2 + 1, pool.shape[0])
    top_g, gi = jax.lax.top_k(pool, kk)
    if kk > k2:
        dropped_max = jnp.maximum(dropped_max, top_g[-1])
        gi = gi[:k2]
    a_idx = gi // m
    off = pa_idx[a_idx, gi % m]
    ox = (off // num_off - nl) * 4  # region corner (leaves [ox, ox+4))
    oy = (off % num_off - nl) * 4

    def expand(a, x, y, child):
        return (jnp.tile(a, 4),
                jnp.concatenate([x, x + child, x, x + child]),
                jnp.concatenate([y, y, y + child, y + child]))

    # Level 1 (sliding 2-cell max bounds), prune back to k2.
    a1, x1, y1 = expand(a_idx, ox, oy, 2)
    s1 = _score_candidates(pyramid[1], base_cells, a1, x1, y1, mask, size)
    s1 = jnp.where(angle_valid[a1], s1, -jnp.inf)
    top1, idx1 = jax.lax.top_k(s1, min(k2 + 1, s1.shape[0]))
    dropped_max = jnp.maximum(dropped_max, top1[-1])
    # Level 0: exact leaf scores for all children of the kept level-1 nodes.
    a0, x0, y0 = expand(a1[idx1[:k2]], x1[idx1[:k2]], y1[idx1[:k2]], 1)
    s0 = _score_candidates(pyramid[0], base_cells, a0, x0, y0, mask, size)
    s0 = jnp.where(angle_valid[a0], s0, -jnp.inf)

    best = jnp.argmax(s0)
    best_score = s0[best]
    found = best_score > min_score
    pose = Rigid2(
        initial_pose.translation
        + jnp.stack([x0[best].astype(jnp.float32),
                     y0[best].astype(jnp.float32)]) * res,
        initial_pose.rotation + deltas[a0[best]],
    )
    if with_certificate:
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
