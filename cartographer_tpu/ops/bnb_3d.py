"""Fast correlative 3D matching: rotational pre-filter + 3D pyramid BnB +
low-resolution gate [KERNEL].

Reference: mapping/internal/3d/scan_matching/fast_correlative_scan_matcher_3d.cc
(+ precomputation_grid_3d.cc): candidate yaws are pruned by rotational
histogram score (min_rotational_score), each surviving yaw's discretized
cloud enters a depth-first branch-and-bound over (x, y, z) with max-pool
pyramid bounds, and leaves must also pass a low-resolution grid score
(min_low_resolution_score).

TPU design mirrors bnb_2d: level-synchronous beam search with batched
scoring; each level splits candidates into 8 children. The rotational filter
and the low-resolution gate run as vectorized masks on the same candidate
arrays.

Memory/compile design (fast_correlative_scan_matcher_3d.cc:61-69,
precomputation_grid_3d.cc PrecomputeGrid half_resolution): only the first
`full_resolution_depth` pyramid levels are stored at full resolution; every
deeper level halves the linear grid size (reduction exponent
re = depth - full_resolution_depth + 1, index math is arithmetic right
shift, rounding toward -inf exactly like the reference's
DivideByTwoRoundingTowardsNegativeInfinity). Levels are quantized to uint8
(precomputation_grid_3d.h:26), so a depth-8 stack over a 256^3 grid costs
~60 MB instead of the 512 MB a full-resolution f32 stack would. The beam
loop runs as two `lax.scan`s (one over the equal-shaped coarse levels, one
over the full-resolution levels) instead of a Python-unrolled loop, keeping
compile time flat in branch_and_bound_depth.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp

from cartographer_tpu.ops.grid_3d import Grid3D
from cartographer_tpu.ops.probability import (
    MAX_PROBABILITY,
    MIN_PROBABILITY,
    UNKNOWN_PROBABILITY,
)
from cartographer_tpu.ops.rot_histogram import match_histograms
from cartographer_tpu.transform import quaternion as quat
from cartographer_tpu.transform.rigid import Rigid3

_Q_SCALE = (MAX_PROBABILITY - MIN_PROBABILITY) / 255.0  # uint8 <-> probability


@dataclasses.dataclass(frozen=True)
class FastCorrelativeMatcherParams3D:
    branch_and_bound_depth: int = 8
    full_resolution_depth: int = 3
    min_rotational_score: float = 0.77
    min_low_resolution_score: float = 0.55
    linear_xy_search_window: float = 5.0
    linear_z_search_window: float = 1.0
    angular_search_window: float = math.radians(15.0)
    beam_width: int = 2048
    max_scan_range: float = 20.0  # static bound on the yaw candidate count

    def static_num_angles(self, resolution: float) -> int:
        step = (1.0 - 1e-3) * math.acos(
            1.0 - resolution**2 / (2.0 * self.max_scan_range**2))
        return 2 * int(math.ceil(self.angular_search_window / step)) + 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PrecomputationStack3D:
    """Mixed-resolution max-pool pyramid, uint8 (PrecomputationGridStack3D).

    full[h] (h < full_resolution_depth): full-res max over windows of
    2^h cells per axis. coarse[j] (global level h = full_resolution_depth+j):
    max over windows of 2^h full-res cells, stored every 2^(j+1) cells and
    padded to a common (S/2)^3 shape so a single lax.scan can iterate all
    coarse levels. One extra stored-cell max absorbs the >>re rounding so
    the parent-bound property (level h >= any descendant leaf) holds.
    """

    full: jnp.ndarray  # (frd, S, S, S) uint8
    coarse: jnp.ndarray  # (depth - frd, S//2, S//2, S//2) uint8
    depth: int = dataclasses.field(metadata=dict(static=True))
    full_resolution_depth: int = dataclasses.field(metadata=dict(static=True))


def _quantize(prob: jnp.ndarray) -> jnp.ndarray:
    v = jnp.round((prob - MIN_PROBABILITY) / _Q_SCALE)
    return jnp.clip(v, 0, 255).astype(jnp.uint8)


def _shift_max(arr: jnp.ndarray, shift: int) -> jnp.ndarray:
    """max(arr, arr shifted down by `shift` along each axis), zero-padded."""
    for axis in range(3):
        pad = [(0, 0)] * 3
        pad[axis] = (0, shift)
        idx = [slice(None)] * 3
        idx[axis] = slice(shift, None)
        arr = jnp.maximum(arr, jnp.pad(arr[tuple(idx)], pad))
    return arr


def _halve(arr: jnp.ndarray) -> jnp.ndarray:
    """2x downsample by max over 2^3 blocks (CellIndexAtHalfResolution)."""
    s = arr.shape[0] // 2
    return (arr.reshape(s, 2, s, 2, s, 2)
            .max(axis=5).max(axis=3).max(axis=1))


def build_precomputation_stack_3d(
    prob: jnp.ndarray, depth: int, full_resolution_depth: int = 3,
) -> PrecomputationStack3D:
    """Build the mixed-resolution pyramid from a (S, S, S) probability grid."""
    frd = max(1, min(full_resolution_depth, depth))
    q = _quantize(prob)
    s = q.shape[0]
    full_levels = [q]
    current = q
    for h in range(1, frd):
        current = _shift_max(current, 1 << (h - 1))
        full_levels.append(current)
    full = jnp.stack(full_levels)

    coarse_levels = []
    for h in range(frd, depth):
        # Double the window: previous stride is 2^(h-frd), so the shift of
        # 2^(h-1) full-res cells is always 2^(frd-1) stored cells.
        current = _shift_max(current, 1 << (frd - 1))
        current = _halve(current)
        # One stored-cell slack so (cell + offset) >> re stays a valid bound.
        current = _shift_max(current, 1)
        pad = s // 2 - current.shape[0]
        coarse_levels.append(jnp.pad(current, [(0, pad)] * 3))
    if coarse_levels:
        coarse = jnp.stack(coarse_levels)
    else:
        coarse = jnp.zeros((0, s // 2, s // 2, s // 2), jnp.uint8)
    return PrecomputationStack3D(full=full, coarse=coarse, depth=depth,
                                 full_resolution_depth=frd)


# Backwards-compatible alias (round-1 name).
def build_precomputation_pyramid_3d(prob: jnp.ndarray, depth: int,
                                    full_resolution_depth: int = 3
                                    ) -> PrecomputationStack3D:
    return build_precomputation_stack_3d(prob, depth, full_resolution_depth)


def _score_level(level: jnp.ndarray, re, base_cells: jnp.ndarray,
                 a_idx: jnp.ndarray, ox, oy, oz, mask: jnp.ndarray,
                 size: int, window) -> jnp.ndarray:
    """Mean probability of the cloud at candidate offsets on one level.

    `re` is the reduction exponent (0 for full-res levels): full-res cell
    coordinates are arithmetic-right-shifted into the level's coarse index
    space (ScoreCandidates, fast_correlative_scan_matcher_3d.cc:332-356).

    `window` = 2^h, the level's max-pool extent: a candidate anchored at a
    negative cell still bounds descendants in [cell, cell+window) ∩ [0, S),
    and the stored value at cell 0 covers [0, window) ⊇ that set, so the
    anchor clips to 0 instead of reading as unknown (the reference's
    DynamicGrid simply grows to hold negative anchor indices). At the leaf
    level window == 1 and this reduces to the exact in-bounds test.
    """
    cx = base_cells[a_idx, :, 0] + ox[:, None]
    cy = base_cells[a_idx, :, 1] + oy[:, None]
    cz = base_cells[a_idx, :, 2] + oz[:, None]
    inb = ((cx > -window) & (cx < size) & (cy > -window) & (cy < size)
           & (cz > -window) & (cz < size))
    gx = jnp.clip(cx, 0, size - 1) >> re
    gy = jnp.clip(cy, 0, size - 1) >> re
    gz = jnp.clip(cz, 0, size - 1) >> re
    v = level[gx, gy, gz].astype(jnp.float32) * _Q_SCALE + MIN_PROBABILITY
    p = jnp.where(inb, v, UNKNOWN_PROBABILITY)
    num = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask[None, :], p, 0.0), axis=-1) / num


def _beam_candidates_3d(stack: PrecomputationStack3D, base_cells, mask,
                        yaw_alive, w_xy: int, w_z: int, size: int,
                        num_angles: int, min_score: float, beam_width: int):
    """Level-synchronous beam search from the stack top (the executable
    specification of the (yaw, x, y, z) tree; CPU default path).

    Returns (a_idx, ox, oy, oz, scores) leaf candidates: all candidates of
    a level are scored in one batched gather (admissible bounds — the max
    over each 2^h block upper-bounds every leaf inside), the top
    `beam_width` survive, and each splits into 8 children. The two
    `lax.scan`s (coarse levels, then full-resolution levels) keep compile
    time flat in branch_and_bound_depth."""
    depth = stack.depth
    frd = stack.full_resolution_depth
    top_stride = 1 << (depth - 1)

    def offsets(w):
        n = 2 * ((w + top_stride - 1) // top_stride) + 1
        return (jnp.arange(n) - n // 2) * top_stride - top_stride // 2

    offs_xy = offsets(w_xy)
    offs_z = offsets(w_z)
    a_g, x_g, y_g, z_g = jnp.meshgrid(
        jnp.arange(num_angles), jnp.arange(offs_xy.shape[0]),
        jnp.arange(offs_xy.shape[0]), jnp.arange(offs_z.shape[0]),
        indexing="ij")
    a_idx = a_g.reshape(-1)
    ox = offs_xy[x_g.reshape(-1)]
    oy = offs_xy[y_g.reshape(-1)]
    oz = offs_z[z_g.reshape(-1)]

    def level_of(h):
        if h >= frd:
            return stack.coarse[h - frd], h - frd + 1
        return stack.full[h], 0

    top_level, top_re = level_of(depth - 1)
    scores = _score_level(top_level, top_re, base_cells, a_idx, ox, oy, oz,
                          mask, size, top_stride)
    scores = jnp.where(yaw_alive[a_idx], scores, -jnp.inf)

    # Fixed-width beam carry: 8 children per surviving parent.
    beam = min(beam_width, scores.shape[0])
    width = 8 * beam
    pad = max(0, width - scores.shape[0])
    a_idx = jnp.pad(a_idx, (0, pad))
    ox = jnp.pad(ox, (0, pad))
    oy = jnp.pad(oy, (0, pad))
    oz = jnp.pad(oz, (0, pad))
    scores = jnp.pad(scores, (0, pad), constant_values=-jnp.inf)
    dropped0 = jnp.float32(-jnp.inf)
    if scores.shape[0] > width:
        dropped0 = jax.lax.top_k(scores, width + 1)[0][-1]
        scores, keep = jax.lax.top_k(scores, width)
        a_idx, ox, oy, oz = a_idx[keep], ox[keep], oy[keep], oz[keep]

    dx = jnp.array([0, 1, 0, 1, 0, 1, 0, 1])
    dy = jnp.array([0, 0, 1, 1, 0, 0, 1, 1])
    dz = jnp.array([0, 0, 0, 0, 1, 1, 1, 1])

    def make_step(levels):
        def step(carry, xs):
            a_idx, ox, oy, oz, scores, dropped = carry
            level_idx, re, child = xs
            top_scores, top_idx = jax.lax.top_k(scores, beam)
            # Max admissible bound among candidates this truncation drops
            # (feeds the caller-visible certificate like ops/bnb_2d.py).
            dropped = jnp.maximum(
                dropped, jax.lax.top_k(scores, beam + 1)[0][-1])
            pa = a_idx[top_idx]
            px, py, pz = ox[top_idx], oy[top_idx], oz[top_idx]
            ca = jnp.tile(pa, 8)
            cx = (px[None, :] + dx[:, None] * child).reshape(-1)
            cy = (py[None, :] + dy[:, None] * child).reshape(-1)
            cz = (pz[None, :] + dz[:, None] * child).reshape(-1)
            alive = jnp.tile(top_scores > min_score, 8)
            s = _score_level(levels[level_idx], re, base_cells, ca,
                             cx, cy, cz, mask, size, child)
            s = jnp.where(alive, s, -jnp.inf)
            return (ca, cx, cy, cz, s, dropped), None

        return step

    carry = (a_idx, ox, oy, oz, scores, dropped0)
    # Coarse levels h = depth-2 .. frd (equal shapes -> one scan).
    n_coarse_steps = max(0, depth - 1 - frd)
    if n_coarse_steps > 0:
        hs = jnp.arange(depth - 2, frd - 1, -1)
        xs = (hs - frd, hs - frd + 1, jnp.left_shift(1, hs))
        carry, _ = jax.lax.scan(make_step(stack.coarse), carry, xs)
    # Full-resolution levels h = min(depth-2, frd-1) .. 0.
    top_full = min(depth - 2, frd - 1)
    if top_full >= 0:
        hs = jnp.arange(top_full, -1, -1)
        xs = (hs, jnp.zeros_like(hs), jnp.left_shift(1, hs))
        carry, _ = jax.lax.scan(make_step(stack.full), carry, xs)
    return carry


def _dense_candidates_3d(stack: PrecomputationStack3D, base_cells, mask,
                         yaw_alive, w_xy: int, w_z: int, size: int,
                         beam_width: int):
    """Dense MXU level-2 bounds for the 3D matcher (TPU production path).

    3D analog of ops/bnb_2d.py `_match_dense`: TPU gathers execute
    near-serially, so instead of descending from the stack top, COMPLETE
    admissible bounds for every level-2 tree node of every yaw (all
    4-cell-aligned (x, y, z) offsets in the window) are computed with zero
    gathers:

    - per yaw a coarse COUNT VOLUME C[a, x, y, z] over the scan's 4-cell
      blocks (one-hot matmul per angle chunk — x one-hot contracted with a
      combined (y, z) one-hot on the MXU, chunked over yaws via lax.scan to
      bound the one-hot working set);
    - a block-max BOUND VOLUME D[i, j, k] = max probability over cells
      [4i, 4i+8) x [4j, 4j+8) x [4k, 4k+8) of the full-res grid (one extra
      low-side block per axis so nodes straddling the map's low edge are
      still upper-bounded; bf16 rounding forced UP);
    - their cross-correlation as ONE grouped 2D convolution with z folded
      into the reduction channels and the z-offset into the batch dim
      (out[kz, a, kx, ky] = sum_{x,y,z} C[a,x,y,z] * Dp[x+kx, y+ky, z+kz]),
      a shape XLA tiles natively onto the MXU — a direct 3D conv lowers
      far worse.

    Completeness at level 2 means no pruning risk above it; the top-K
    surviving regions descend levels 1 and 0 with the exact gather scorer.
    Bound admissibility: leaves of the node at offset 4(k - nl) for a point
    in block b span cells [4(b+k), 4(b+k)+8) per axis, covered by D[b+k].

    Returns (a_idx, ox, oy, oz, scores) leaf candidates.
    """
    num_angles, n_pts = base_cells.shape[0], base_cells.shape[1]
    nl_xy = -(-w_xy // 4)
    nl_z = -(-w_z // 4)
    sc = size // 4
    ext_xy = sc + 2 * nl_xy + 1  # extended coarse space [-nl-1, sc+nl)
    ext_z = sc + 2 * nl_z + 1
    num_off_xy = 2 * nl_xy + 1
    num_off_z = 2 * nl_z + 1
    num_valid = jnp.maximum(jnp.sum(mask), 1).astype(jnp.float32)

    # --- Stage A: dense level-2 bounds ---------------------------------
    cc = (base_cells >> 2) + jnp.array([nl_xy + 1, nl_xy + 1, nl_z + 1])
    inr = ((cc[..., 0] >= 0) & (cc[..., 0] < ext_xy)
           & (cc[..., 1] >= 0) & (cc[..., 1] < ext_xy)
           & (cc[..., 2] >= 0) & (cc[..., 2] < ext_z)
           & mask[None, :])
    oob = num_valid - jnp.sum(inr, axis=-1).astype(jnp.float32)  # (A,)
    lin_yz = cc[..., 1] * ext_z + cc[..., 2]  # (A, N)

    # Count volume per yaw, chunked so the (g, N, ext_xy*ext_z) one-hot
    # stays ~100 MB instead of A/g times that.
    g = min(8, num_angles)
    a_pad = (-num_angles) % g
    cx_ = jnp.pad(cc[..., 0], ((0, a_pad), (0, 0)))
    lyz_ = jnp.pad(lin_yz, ((0, a_pad), (0, 0)))
    inr_ = jnp.pad(inr, ((0, a_pad), (0, 0)))

    def count_chunk(_, xs):
        cxc, lyzc, inrc = xs  # (g, N) each
        iox = jax.lax.broadcasted_iota(jnp.int32, (g, n_pts, ext_xy), 2)
        Px = ((iox == cxc[..., None]) & inrc[..., None]).astype(jnp.bfloat16)
        ioyz = jax.lax.broadcasted_iota(
            jnp.int32, (g, n_pts, ext_xy * ext_z), 2)
        Pyz = ((ioyz == lyzc[..., None]) & inrc[..., None]).astype(jnp.bfloat16)
        # Counts accumulate exactly in f32, then round UP into bf16 so a
        # count > 256 cannot round down and under-compute a bound (the same
        # admissibility trick as the bound volume D below).
        Cc = jnp.einsum("anx,anm->axm", Px, Pyz,
                        preferred_element_type=jnp.float32)
        return None, (Cc * (1.0 + 2.0 ** -7)).astype(jnp.bfloat16)

    xs = (cx_.reshape(-1, g, n_pts), lyz_.reshape(-1, g, n_pts),
          inr_.reshape(-1, g, n_pts))
    _, C = jax.lax.scan(count_chunk, None, xs)
    C = C.reshape(-1, ext_xy, ext_xy, ext_z)[:num_angles]  # (A, X, Y, Z)

    # Bound volume from the dequantized full-res level (the same values the
    # exact leaf scorer reads), padded one block low-side per axis.
    prob = stack.full[0].astype(jnp.float32) * _Q_SCALE + MIN_PROBABILITY
    d = (prob.reshape(sc, 4, sc, 4, sc, 4).max(axis=(1, 3, 5)))
    dpad = jnp.pad(d, 1, constant_values=UNKNOWN_PROBABILITY)
    D = dpad[:-1, :-1, :-1]
    for sx in range(2):
        for sy in range(2):
            for sz in range(2):
                if sx or sy or sz:
                    D = jnp.maximum(D, dpad[sx:sx + sc + 1, sy:sy + sc + 1,
                                            sz:sz + sc + 1])
    D = (D * (1.0 + 2.0 ** -7)).astype(jnp.bfloat16)  # round UP into bf16
    dp = jnp.pad(D, ((2 * nl_xy,) * 2, (2 * nl_xy,) * 2, (2 * nl_z,) * 2),
                 constant_values=UNKNOWN_PROBABILITY)

    # z-offset as conv batch, z as reduction channels: In[kz, z, x, y].
    # NOTE: the 2D matcher's scanned-matmul rewrite of this correlation
    # (ops/bnb_2d.py) was ALSO tried here and measured 3x SLOWER (15.7 ->
    # 46.3 ms on v5e): the per-row (ky, kz) window materialization costs
    # more than this conv's moderate-kernel lowering — the 2D win comes
    # from its pathological ext^2-element kernels, which the z-channel
    # folding here already avoids.
    In = jnp.stack([dp[:, :, kz:kz + ext_z].transpose(2, 0, 1)
                    for kz in range(num_off_z)])
    K = C.transpose(0, 3, 1, 2)  # (A, Z, X, Y)
    raw = jax.lax.conv_general_dilated(
        In, K, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)  # (num_off_z, A, kx, ky)
    bounds = (raw.transpose(1, 2, 3, 0)
              + (UNKNOWN_PROBABILITY * oob)[:, None, None, None]) / num_valid
    bounds = jnp.where(yaw_alive[:, None, None, None], bounds, -jnp.inf)

    # --- Stage B: hierarchical top-K regions -> exact leaf scores ------
    # Every truncation (per-yaw top-m, global top-k2, level-1 beam) feeds
    # `dropped_max` so callers can detect a potentially pruned optimum —
    # the same certificate accounting as the 2D dense path.
    cells = num_off_xy * num_off_xy * num_off_z
    k2 = min(max(beam_width // 8, 256), num_angles * cells)
    m = min(cells, max(8, -(-2 * k2 // num_angles)))
    pa_vals, pa_idx = jax.lax.top_k(bounds.reshape(num_angles, cells),
                                    min(m + 1, cells))
    if pa_vals.shape[1] > m:
        dropped_max = jnp.max(pa_vals[:, m])
        pa_vals = pa_vals[:, :m]
        pa_idx = pa_idx[:, :m]
    else:
        dropped_max = jnp.float32(-jnp.inf)
    pool = pa_vals.reshape(-1)
    kk = min(k2 + 1, pool.shape[0])
    top_g, gi = jax.lax.top_k(pool, kk)
    if kk > k2:
        dropped_max = jnp.maximum(dropped_max, top_g[-1])
        gi = gi[:k2]
    a_idx = gi // m
    off = pa_idx[a_idx, gi % m]
    kx = off // (num_off_xy * num_off_z)
    ky = (off // num_off_z) % num_off_xy
    kz = off % num_off_z
    ox = (kx - nl_xy) * 4
    oy = (ky - nl_xy) * 4
    oz = (kz - nl_z) * 4

    dxyz = jnp.stack(jnp.meshgrid(jnp.arange(2), jnp.arange(2),
                                  jnp.arange(2), indexing="ij"),
                     -1).reshape(8, 3)

    def expand(a, x, y, z, child):
        return (jnp.tile(a, 8),
                (x[None, :] + dxyz[:, 0:1] * child).reshape(-1),
                (y[None, :] + dxyz[:, 1:2] * child).reshape(-1),
                (z[None, :] + dxyz[:, 2:3] * child).reshape(-1))

    # Level 1 (2-cell max bounds), prune back to k2.
    a1, x1, y1, z1 = expand(a_idx, ox, oy, oz, 2)
    s1 = _score_level(stack.full[1], 0, base_cells, a1, x1, y1, z1,
                      mask, size, 2)
    s1 = jnp.where(yaw_alive[a1], s1, -jnp.inf)
    top1, idx1 = jax.lax.top_k(s1, min(k2 + 1, s1.shape[0]))
    dropped_max = jnp.maximum(dropped_max, top1[-1])
    idx1 = idx1[:k2]
    # Level 0: exact leaf scores for all children of the kept level-1 nodes.
    a0, x0, y0, z0 = expand(a1[idx1], x1[idx1], y1[idx1], z1[idx1], 1)
    s0 = _score_level(stack.full[0], 0, base_cells, a0, x0, y0, z0,
                      mask, size, 1)
    s0 = jnp.where(yaw_alive[a0], s0, -jnp.inf)
    return a0, x0, y0, z0, s0, dropped_max


def fast_correlative_match_3d(
    stack: PrecomputationStack3D,  # over the high-res grid
    grid: Grid3D,  # high-res grid (metadata)
    low_grid: Grid3D,  # low-resolution grid for the leaf gate
    points: jnp.ndarray,  # (N, 3) node cloud (high-res filtered)
    mask: jnp.ndarray,
    low_points: jnp.ndarray,  # (Nl, 3) low-res filtered cloud
    low_mask: jnp.ndarray,
    scan_histogram: jnp.ndarray,  # (bins,)
    submap_histogram: jnp.ndarray,  # (bins,)
    initial_pose: Rigid3,  # node pose estimate in submap/grid frame
    params: FastCorrelativeMatcherParams3D,
    min_score: float,
    method: str = "auto",
    with_certificate: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, Rigid3, jnp.ndarray, jnp.ndarray]:
    """Returns (found, score, pose, rotational_score, low_resolution_score);
    with `with_certificate`, additionally `certified` — True when no
    truncation (per-yaw top-m, top-k2 region pool, level beams) ever dropped
    an admissible bound above the returned score, i.e. the score is provably
    the search-tree optimum (the low-resolution gate, applied to the top
    leaves only, is outside the certificate like the reference's per-leaf
    gate, low_resolution_matcher.cc).

    `method` selects the candidate-search strategy over the same tree (see
    ops/bnb_2d.py for the rationale): "dense" (TPU default) computes
    complete admissible level-2 bounds as one MXU count-volume correlation
    and gather-descends only the top-K regions; "beam" (CPU default) is the
    level-synchronous beam search from the stack top.
    """
    depth = stack.depth
    frd = stack.full_resolution_depth
    res = grid.resolution
    size = grid.size
    num_angles = params.static_num_angles(res)
    if method == "auto":
        method = "dense" if jax.default_backend() == "tpu" else "beam"
    if method == "dense" and (size % 4 != 0 or frd < 2):
        method = "beam"  # block pooling needs 4-aligned grids + full[1]

    ranges = jnp.linalg.norm(points, axis=-1)
    max_range = jnp.maximum(jnp.max(jnp.where(mask, ranges, 0.0)), 3.0 * res)
    step = (1.0 - 1e-3) * jnp.arccos(1.0 - res**2 / (2.0 * max_range**2))
    half = (num_angles - 1) // 2
    deltas = (jnp.arange(num_angles, dtype=jnp.float32) - half) * step
    angle_valid = jnp.abs(deltas) <= params.angular_search_window + 1e-6

    # Rotational histogram pre-filter over candidate yaws
    # (fast_correlative_scan_matcher_3d.cc min_rotational_score gate).
    initial_yaw = quat.get_yaw(initial_pose.rotation)
    rot_scores = match_histograms(
        submap_histogram, scan_histogram, initial_yaw + deltas)
    yaw_alive = angle_valid & (rot_scores >= params.min_rotational_score)

    # Per-yaw rotated + discretized clouds.
    yaw_qs = quat.from_yaw(deltas)  # rotation about z applied after initial
    rotated = quat.rotate(yaw_qs[:, None, :],
                          quat.rotate(initial_pose.rotation[None, None, :],
                                      points[None, :, :]))
    world = rotated + initial_pose.translation[None, None, :]
    base_cells = grid.world_to_cell(world)  # (A, N, 3)
    low_rotated = quat.rotate(yaw_qs[:, None, :],
                              quat.rotate(initial_pose.rotation[None, None, :],
                                          low_points[None, :, :]))
    low_world = low_rotated + initial_pose.translation[None, None, :]
    low_base = low_grid.world_to_cell(low_world)  # (A, Nl, 3)

    w_xy = int(math.ceil(params.linear_xy_search_window / res))
    w_z = int(math.ceil(params.linear_z_search_window / res))

    return _match_tail(
        stack, grid, low_grid, base_cells, mask, low_base, low_mask,
        yaw_alive, rot_scores,
        quat.multiply(yaw_qs, initial_pose.rotation[None, :]),
        initial_pose.translation, w_xy, w_z, num_angles, params, min_score,
        method, with_certificate)


def _match_tail(stack, grid, low_grid, base_cells, mask, low_base, low_mask,
                yaw_alive, rot_scores, yaw_qs_abs, init_translation,
                w_xy, w_z, num_angles, params, min_score, method,
                with_certificate):
    """Translation search + low-resolution gate + best-candidate selection,
    shared by the local-window matcher and MatchFullSubmap. `yaw_qs_abs` are
    the ABSOLUTE candidate rotations (yaw delta already composed with the
    initial rotation), aligned with the yaw axis of `base_cells`/`low_base`/
    `rot_scores`."""
    size = grid.size
    res = grid.resolution
    if method == "dense":
        a_idx, ox, oy, oz, scores, dropped_max = _dense_candidates_3d(
            stack, base_cells, mask, yaw_alive, w_xy, w_z, size,
            params.beam_width)
    else:
        a_idx, ox, oy, oz, scores, dropped_max = _beam_candidates_3d(
            stack, base_cells, mask, yaw_alive, w_xy, w_z, size,
            num_angles, min_score, params.beam_width)

    # Leaf low-resolution gate: score the best candidates on the low grid
    # (low_resolution_matcher.cc) and kill those below threshold.
    k = min(64, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    if scores.shape[0] > k:
        dropped_max = jnp.maximum(
            dropped_max, jax.lax.top_k(scores, k + 1)[0][-1])
    la = a_idx[top_idx]
    lx, ly, lz = ox[top_idx], oy[top_idx], oz[top_idx]
    # Offsets are in high-res cells; convert to low-res cell offsets.
    ratio = res / low_grid.resolution
    low_ox = jnp.round(lx.astype(jnp.float32) * ratio).astype(jnp.int32)
    low_oy = jnp.round(ly.astype(jnp.float32) * ratio).astype(jnp.int32)
    low_oz = jnp.round(lz.astype(jnp.float32) * ratio).astype(jnp.int32)
    low_scores = _score_3d(low_grid.probability(), low_base, la,
                           low_ox, low_oy, low_oz, low_mask, low_grid.size)
    gated = jnp.where(low_scores >= params.min_low_resolution_score,
                      top_scores, -jnp.inf)
    best = jnp.argmax(gated)
    best_score = gated[best]
    found = best_score > min_score

    offset = jnp.stack([lx[best], ly[best], lz[best]]).astype(jnp.float32) * res
    pose = Rigid3(
        init_translation + offset,
        quat.normalize(yaw_qs_abs[la[best]]),
    )
    if with_certificate:
        certified = (best_score >= dropped_max) | (dropped_max <= min_score)
        return (found, best_score, pose, rot_scores[la[best]],
                low_scores[best], certified)
    return found, best_score, pose, rot_scores[la[best]], low_scores[best]


def match_full_submap_3d(
    stack: PrecomputationStack3D,
    grid: Grid3D,
    low_grid: Grid3D,
    points: jnp.ndarray,  # (N, 3) node cloud (high-res filtered)
    mask: jnp.ndarray,
    low_points: jnp.ndarray,
    low_mask: jnp.ndarray,
    scan_histogram: jnp.ndarray,
    submap_histogram: jnp.ndarray,
    node_rotation: jnp.ndarray,  # (4,) global node rotation (gravity-aligned)
    submap_rotation: jnp.ndarray,  # (4,) global submap rotation
    params: FastCorrelativeMatcherParams3D,
    min_score: float,
    top_k_yaws: int = 64,
    extra_window_cells: int = 4,
    method: str = "auto",
    with_certificate: bool = False,
):
    """MatchFullSubmap: global 3D localization with no pose prior.

    Reference fast_correlative_scan_matcher_3d.cc:147-169: the node and
    submap global rotations agree only on gravity (their relative yaw is
    arbitrary), the angular window is the FULL circle, and the linear window
    covers the whole submap. TPU design: candidate yaws are laid out densely
    over the full circle at the reference's angular step, scored against the
    submap rotational histogram in one vectorized pass, and the top-K
    surviving yaws (min_rotational_score gate) enter the SAME translation
    search as the local-window matcher with the window widened to the grid
    half-size + `extra_window_cells`. The reference instead widens by the
    node's max point range so even a sensor origin outside the grid can be
    found; a static-shape search centers on origin-in-grid — the case a
    relocalizing robot is in — plus the margin.

    With `with_certificate`, `certified` additionally requires that the
    top-K yaw truncation dropped no yaw passing the rotational gate
    (the reference searches every surviving yaw).

    Returns (found, score, pose_in_grid_frame, rotational_score,
    low_resolution_score[, certified]).
    """
    res = grid.resolution
    size = grid.size
    frd = stack.full_resolution_depth
    if method == "auto":
        method = "dense" if jax.default_backend() == "tpu" else "beam"
    if method == "dense" and (size % 4 != 0 or frd < 2):
        method = "beam"

    # Relative rotation in the grid frame; its yaw component is arbitrary
    # (the search owns yaw), roll/pitch encode the shared gravity alignment.
    q_rel = quat.normalize(
        quat.multiply(quat.conjugate(submap_rotation), node_rotation))
    center = grid.origin + 0.5 * size * res

    # Dense full-circle yaw candidates at the reference's angular step
    # (GenerateDiscreteScans with angular window pi), statically bounded.
    step = (1.0 - 1e-3) * math.acos(
        1.0 - res**2 / (2.0 * params.max_scan_range**2))
    n_yaws = min(2 * int(math.ceil(math.pi / step)) + 1, 4096)
    deltas = (jnp.arange(n_yaws, dtype=jnp.float32)
              - n_yaws // 2) * (2.0 * math.pi / n_yaws)

    initial_yaw = quat.get_yaw(q_rel)
    rot_scores_all = match_histograms(
        submap_histogram, scan_histogram, initial_yaw + deltas)
    alive_all = rot_scores_all >= params.min_rotational_score
    ranked = jnp.where(alive_all, rot_scores_all, -jnp.inf)
    K = min(top_k_yaws, n_yaws)
    _, sel = jax.lax.top_k(ranked, K)
    yaw_alive = alive_all[sel]
    rot_scores = rot_scores_all[sel]
    sel_deltas = deltas[sel]

    yaw_qs = quat.from_yaw(sel_deltas)  # (K, 4)
    rotated = quat.rotate(yaw_qs[:, None, :],
                          quat.rotate(q_rel[None, None, :],
                                      points[None, :, :]))
    base_cells = grid.world_to_cell(rotated + center[None, None, :])
    low_rotated = quat.rotate(yaw_qs[:, None, :],
                              quat.rotate(q_rel[None, None, :],
                                          low_points[None, :, :]))
    low_base = low_grid.world_to_cell(low_rotated + center[None, None, :])

    w = size // 2 + extra_window_cells
    out = _match_tail(
        stack, grid, low_grid, base_cells, mask, low_base, low_mask,
        yaw_alive, rot_scores, quat.multiply(yaw_qs, q_rel[None, :]),
        center, w, w, K, params, min_score, method, with_certificate)
    if with_certificate:
        found, score, pose, rot, low, certified = out
        certified = certified & (jnp.sum(alive_all) <= K)
        return found, score, pose, rot, low, certified
    return out


@lru_cache(maxsize=None)
def _full_submap_match_fn(params: FastCorrelativeMatcherParams3D,
                          min_score: float, top_k_yaws: int):
    return jax.jit(partial(
        match_full_submap_3d, params=params, min_score=min_score,
        top_k_yaws=top_k_yaws, with_certificate=True))


def match_full_submap_3d_exact(
    stack: PrecomputationStack3D,
    grid: Grid3D,
    low_grid: Grid3D,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    low_points: jnp.ndarray,
    low_mask: jnp.ndarray,
    scan_histogram: jnp.ndarray,
    submap_histogram: jnp.ndarray,
    node_rotation: jnp.ndarray,
    submap_rotation: jnp.ndarray,
    params: FastCorrelativeMatcherParams3D,
    min_score: float,
    max_beam: int = 32768,
    max_yaws: int = 512,
):
    """Certified MatchFullSubmap by iterative widening (the 3D analog of
    bnb_2d.match_full_submap_exact): rerun with doubled beam width and yaw
    budget until the optimality certificate holds or the budgets cap out —
    a missed first cross-trajectory constraint is unrecoverable, so global
    localization keeps the reference's exact-DFS semantics where feasible.
    Returns (found, score, pose, rotational_score, low_resolution_score,
    certified) as host values."""
    beam = params.beam_width
    top_k = 64
    while True:
        p = dataclasses.replace(params, beam_width=beam)
        found, score, pose, rot, low, cert = _full_submap_match_fn(
            p, min_score, top_k)(
            stack, grid, low_grid, points, mask, low_points, low_mask,
            scan_histogram, submap_histogram, node_rotation, submap_rotation)
        if bool(cert) or (beam >= max_beam and top_k >= max_yaws):
            return (bool(found), float(score), pose, float(rot), float(low),
                    bool(cert))
        beam = min(2 * beam, max_beam)
        top_k = min(2 * top_k, max_yaws)


def _score_3d(level: jnp.ndarray, base_cells: jnp.ndarray,
              a_idx: jnp.ndarray, ox, oy, oz, mask: jnp.ndarray,
              size: int) -> jnp.ndarray:
    """Mean probability on a float probability grid (low-resolution gate)."""
    cx = base_cells[a_idx, :, 0] + ox[:, None]
    cy = base_cells[a_idx, :, 1] + oy[:, None]
    cz = base_cells[a_idx, :, 2] + oz[:, None]
    inb = ((cx >= 0) & (cx < size) & (cy >= 0) & (cy < size)
           & (cz >= 0) & (cz < size))
    p = jnp.where(inb, level[jnp.clip(cx, 0, size - 1),
                             jnp.clip(cy, 0, size - 1),
                             jnp.clip(cz, 0, size - 1)], UNKNOWN_PROBABILITY)
    num = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask[None, :], p, 0.0), axis=-1) / num
