"""Real-time correlative scan matching 2D as one batched scoring op [KERNEL].

Reference: mapping/internal/2d/scan_matching/real_time_correlative_scan_matcher_2d.cc
and the shared search-space helpers correlative_scan_matcher_2d.cc.

TPU design: the reference's triple loop over (theta, dx, dy) candidates with
a per-point inner loop becomes, per angle, a *count image* built on the MXU
(one-hot matmul, see ops/onehot.py) cross-correlated with the grid over the
shift window — no gathers on the hot path (TPU executes gathers
near-serially; the direct gather port profiled 112 ms/scan vs ~2 ms for the
matmul form on a v5e chip). The angular step is data-dependent in the
reference (computed from the scan radius); here the candidate tensor has a
static worst-case angle count (from the configured max range) and
out-of-window angles are masked, so one compiled program serves every scan.

`method="gather"` keeps the direct port for CPU tests and as the executable
specification of the scoring semantics.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from cartographer_tpu.ops.grid_2d import Grid2D
from cartographer_tpu.ops.onehot import onehot_rows
from cartographer_tpu.ops.probability import UNKNOWN_PROBABILITY
from cartographer_tpu.transform.rigid import Rigid2


@dataclasses.dataclass(frozen=True)
class CorrelativeSearchParams:
    """Static search-space geometry (shapes baked into the compiled program)."""

    linear_search_window: float = 0.1  # meters
    angular_search_window: float = math.radians(20.0)
    translation_delta_cost_weight: float = 1e-1
    rotation_delta_cost_weight: float = 1e-1
    max_num_angles: int = 0  # static; 0 = derive from max_scan_range below
    max_scan_range: float = 30.0  # used to bound the angular step statically
    angle_chunk: int = 32  # angles per matmul batch (memory knob)

    def num_linear(self, resolution: float) -> int:
        return int(math.ceil(self.linear_search_window / resolution))

    def static_num_angles(self, resolution: float) -> int:
        if self.max_num_angles:
            return self.max_num_angles
        # Worst-case (finest) angular step from the configured max range:
        # correlative_scan_matcher_2d.cc:40-44.
        step = (1.0 - 1e-3) * math.acos(
            1.0 - resolution**2 / (2.0 * self.max_scan_range**2))
        n = int(math.ceil(self.angular_search_window / step))
        return 2 * n + 1


def _angular_step(points: jnp.ndarray, mask: jnp.ndarray, resolution: float) -> jnp.ndarray:
    """Data-dependent angular step (SearchParameters ctor,
    correlative_scan_matcher_2d.cc:31-42)."""
    ranges = jnp.linalg.norm(points, axis=-1)
    max_range = jnp.maximum(jnp.max(jnp.where(mask, ranges, 0.0)), 3.0 * resolution)
    return (1.0 - 1e-3) * jnp.arccos(1.0 - resolution**2 / (2.0 * max_range**2))


def _candidate_geometry(grid, points, mask, initial_pose, params):
    res = grid.resolution
    num_angles = params.static_num_angles(res)
    step = _angular_step(points, mask, res)
    half = (num_angles - 1) // 2
    deltas = (jnp.arange(num_angles, dtype=jnp.float32) - half) * step
    angle_valid = jnp.abs(deltas) <= params.angular_search_window + 1e-6
    rots = Rigid2(jnp.zeros((num_angles, 2)), initial_pose.rotation[None] + deltas)
    world = rots.apply(points[None, :, :]) + initial_pose.translation[None, None, :]
    base_cells = grid.world_to_cell(world)  # (A, N, 2)
    return deltas, angle_valid, base_cells


def _scores_gather(grid, prob, base_cells, mask, nl):
    shifts = jnp.arange(-nl, nl + 1)
    sx = base_cells[:, None, None, :, 0] + shifts[None, :, None, None]
    sy = base_cells[:, None, None, :, 1] + shifts[None, None, :, None]
    in_bounds = (sx >= 0) & (sx < grid.size) & (sy >= 0) & (sy < grid.size)
    p = jnp.where(
        in_bounds,
        prob[jnp.clip(sx, 0, grid.size - 1), jnp.clip(sy, 0, grid.size - 1)],
        UNKNOWN_PROBABILITY,
    )  # (A, X, Y, N)
    num_valid = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask[None, None, None, :], p, 0.0), axis=-1) / num_valid


def _scores_mxu(grid, prob, base_cells, mask, nl, chunk):
    """Count-image formulation: per angle U = P^T Q; scores = U (x) shifted
    grids. Out-of-bounds points contribute UNKNOWN_PROBABILITY via a per-angle
    correction (computed at zero shift; the <=nl-cell window makes the
    boundary-crossing difference negligible, as in the padded reference grid).
    """
    s = grid.size
    num_angles = base_cells.shape[0]
    num_valid = jnp.maximum(jnp.sum(mask), 1).astype(jnp.float32)
    padded = jnp.pad(prob, nl)
    shifted = jnp.stack(
        [padded[a:a + s, b:b + s]
         for a in range(2 * nl + 1) for b in range(2 * nl + 1)]
    ).reshape((2 * nl + 1) ** 2, s * s)

    pad_angles = (-num_angles) % chunk
    cells = jnp.pad(base_cells, ((0, pad_angles), (0, 0), (0, 0)))
    shifted_bf16 = shifted.astype(jnp.bfloat16)

    def score_chunk(cells_chunk):  # (C, N, 2)
        cx = cells_chunk[..., 0]
        cy = cells_chunk[..., 1]
        inb = (cx >= 0) & (cx < s) & (cy >= 0) & (cy < s) & mask[None, :]
        P = jax.vmap(lambda c, v: onehot_rows(c, v, s))(cx, inb)  # (C, N, S)
        Q = jax.vmap(lambda c, v: onehot_rows(c, v, s))(cy, inb)
        # bf16 count image (exact for small per-cell counts) halves the HBM
        # traffic of the dominant U read/write — the hot path is
        # bandwidth-bound, not FLOP-bound. (int8 operands profile ~100x
        # slower here: XLA's TPU int8 einsum lowering falls off the MXU.)
        U = jnp.einsum("cns,cnr->csr", P, Q,
                       preferred_element_type=jnp.bfloat16)  # (C, S, S)
        raw = jnp.dot(U.reshape(U.shape[0], s * s), shifted_bf16.T,
                      preferred_element_type=jnp.float32)  # (C, W^2)
        oob = num_valid - jnp.sum(inb, axis=-1).astype(jnp.float32)  # (C,)
        return (raw + (UNKNOWN_PROBABILITY * oob)[:, None]) / num_valid

    chunks = cells.reshape(-1, chunk, *cells.shape[1:])
    scores = jax.lax.map(score_chunk, chunks)
    w = 2 * nl + 1
    return scores.reshape(-1, w, w)[:num_angles]


def real_time_correlative_match(
    grid: Grid2D,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    initial_pose: Rigid2,
    params: CorrelativeSearchParams,
    method: str = "auto",
) -> Tuple[jnp.ndarray, Rigid2]:
    """Exhaustive (theta, x, y) window search around `initial_pose`.

    Args:
      grid: submap grid; `points` (N, 2) are in the scan frame, `mask` (N,).
      initial_pose: scan pose estimate in the grid (submap) frame.
      method: "mxu" (count-image matmuls), "gather" (direct port), or "auto"
        (mxu on TPU, gather elsewhere).

    Returns:
      (best_score, best_pose) — score is the mean hit probability of the best
      candidate, weighted by the exp(-(d*tw + |dtheta|*rw)^2) motion prior
      (real_time_correlative_scan_matcher_2d.cc:170-175).
    """
    if method == "auto":
        method = "mxu" if jax.default_backend() == "tpu" else "gather"
    res = grid.resolution
    nl = params.num_linear(res)
    prob = grid.probability()
    deltas, angle_valid, base_cells = _candidate_geometry(
        grid, points, mask, initial_pose, params)

    # (A hand-written Pallas VMEM-resident variant of the count-image
    # kernel was measured at 2.14 ms/call vs 0.77 ms for this XLA
    # formulation on v5e — XLA's fusion wins; the kernel was removed.)
    if method == "mxu":
        raw = _scores_mxu(grid, prob, base_cells, mask, nl, params.angle_chunk)
    else:
        raw = _scores_gather(grid, prob, base_cells, mask, nl)

    shifts = jnp.arange(-nl, nl + 1)
    dxy = jnp.abs(shifts.astype(jnp.float32)) * res
    dist = jnp.sqrt(dxy[None, :, None] ** 2 + dxy[None, None, :] ** 2)
    penalty = jnp.exp(
        -((dist * params.translation_delta_cost_weight
           + jnp.abs(deltas)[:, None, None] * params.rotation_delta_cost_weight) ** 2))
    scores = jnp.where(angle_valid[:, None, None], raw * penalty, -jnp.inf)

    flat = jnp.argmax(scores)
    a, ix, iy = jnp.unravel_index(flat, scores.shape)
    best_pose = Rigid2(
        initial_pose.translation
        + jnp.stack([shifts[ix].astype(jnp.float32), shifts[iy].astype(jnp.float32)]) * res,
        initial_pose.rotation + deltas[a],
    )
    return scores[a, ix, iy], best_pose
