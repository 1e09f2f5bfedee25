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
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from cartographer_tpu.ops.grid_3d import Grid3D
from cartographer_tpu.ops.probability import UNKNOWN_PROBABILITY
from cartographer_tpu.ops.rot_histogram import match_histograms
from cartographer_tpu.transform import quaternion as quat
from cartographer_tpu.transform.rigid import Rigid3


@dataclasses.dataclass(frozen=True)
class FastCorrelativeMatcherParams3D:
    branch_and_bound_depth: int = 8
    full_resolution_depth: int = 3  # kept for config parity (pyramid is full-res)
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


def build_precomputation_pyramid_3d(prob: jnp.ndarray, depth: int) -> jnp.ndarray:
    """(depth, S, S, S); level h = max over [idx, idx + 2^h) per axis
    (PrecomputationGrid3D, log-doubling construction)."""
    levels = [prob]
    current = prob
    for h in range(1, depth):
        shift = 1 << (h - 1)
        for axis in range(3):
            pad = [(0, 0)] * 3
            pad[axis] = (0, shift)
            idx = [slice(None)] * 3
            idx[axis] = slice(shift, None)
            shifted = jnp.pad(current[tuple(idx)], pad,
                              constant_values=UNKNOWN_PROBABILITY)
            current = jnp.maximum(current, shifted)
        levels.append(current)
    return jnp.stack(levels)


def _score_3d(level: jnp.ndarray, base_cells: jnp.ndarray,
              a_idx: jnp.ndarray, ox, oy, oz, mask: jnp.ndarray,
              size: int) -> jnp.ndarray:
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


def fast_correlative_match_3d(
    pyramid: jnp.ndarray,  # (depth, S, S, S) over the high-res grid
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
) -> Tuple[jnp.ndarray, jnp.ndarray, Rigid3, jnp.ndarray, jnp.ndarray]:
    """Returns (found, score, pose, rotational_score, low_resolution_score)."""
    depth = pyramid.shape[0]
    res = grid.resolution
    size = grid.size
    num_angles = params.static_num_angles(res)

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
    scores = _score_3d(pyramid[depth - 1], base_cells, a_idx, ox, oy, oz, mask, size)
    scores = jnp.where(yaw_alive[a_idx], scores, -jnp.inf)

    beam = params.beam_width
    for h in range(depth - 2, -1, -1):
        k = min(beam, scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        a_idx = a_idx[top_idx]
        ox = ox[top_idx]
        oy = oy[top_idx]
        oz = oz[top_idx]
        child = 1 << h
        a_idx = jnp.tile(a_idx, 8)
        ox = jnp.concatenate([ox + dx * child for dx in (0, 1, 0, 1, 0, 1, 0, 1)])
        oy = jnp.concatenate([oy + dy * child for dy in (0, 0, 1, 1, 0, 0, 1, 1)])
        oz = jnp.concatenate([oz + dz * child for dz in (0, 0, 0, 0, 1, 1, 1, 1)])
        parent_alive = jnp.tile(top_scores > min_score, 8)
        scores = _score_3d(pyramid[h], base_cells, a_idx, ox, oy, oz, mask, size)
        scores = jnp.where(parent_alive, scores, -jnp.inf)

    # Leaf low-resolution gate: score the best candidates on the low grid
    # (low_resolution_matcher.cc) and kill those below threshold.
    k = min(64, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
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
        initial_pose.translation + offset,
        quat.normalize(quat.multiply(yaw_qs[la[best]], initial_pose.rotation)),
    )
    return found, best_score, pose, rot_scores[la[best]], low_scores[best]
