"""Gauss-Newton 2D scan refinement — the CeresScanMatcher2D replacement [KERNEL].

Reference: mapping/internal/2d/scan_matching/ceres_scan_matcher_2d.cc with the
bicubic occupied-space residual of occupied_space_cost_function_2d.cc (the
kPadding border trick there corresponds to our interpolator's flat border
clamp) plus translation/rotation delta penalties.

TPU design: instead of Ceres' autodiff + sparse solver, the residual vector
(one occupied-space term per padded point + 3 penalty terms) is differentiated
with jax.jacfwd through the bicubic interpolation and minimized with a
fixed-iteration Levenberg-Marquardt on the 3-vector (x, y, theta) — fully
on-device, batchable over scans with vmap.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from cartographer_tpu.ops.gauss_newton import lm_solve
from cartographer_tpu.ops.grid_2d import Grid2D
from cartographer_tpu.ops.interp import interp_bicubic
from cartographer_tpu.transform.rigid import Rigid2


@dataclasses.dataclass(frozen=True)
class GaussNewtonMatcherParams2D:
    occupied_space_weight: float = 1.0
    translation_weight: float = 10.0
    rotation_weight: float = 40.0
    num_iterations: int = 20  # ceres_solver_options.max_num_iterations
    use_nonmonotonic_steps: bool = False  # ceres_solver_options


def occupied_space_residuals(
    grid_prob: jnp.ndarray,
    grid: Grid2D,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    pose_vec: jnp.ndarray,
    weight: float,
    method: str = "auto",
) -> jnp.ndarray:
    """Per-point residual w * (1 - P(T(p))) with bicubic P; invalid -> 0.

    Matches OccupiedSpaceCostFunction2D (occupied_space_cost_function_2d.cc):
    each residual scaled by occupied_space_weight / sqrt(num_points).
    On TPU the interpolation runs as banded weight-matrix matmuls
    (ops/onehot.interp_bicubic_mm) — the 16-neighbor gather form is
    memory-latency bound there.
    """
    if method == "auto":
        method = "mxu" if jax.default_backend() == "tpu" else "gather"
    pose = Rigid2.from_vector(pose_vec)
    world = pose.apply(points)
    coords = grid.world_to_cell_continuous(world)
    if method == "mxu":
        from cartographer_tpu.ops.onehot import interp_bicubic_mm
        p = interp_bicubic_mm(grid_prob, coords, dtype=jnp.bfloat16)
    else:
        p = interp_bicubic(grid_prob, coords)
    n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    scale = weight / jnp.sqrt(n)
    return jnp.where(mask, scale * (1.0 - p), 0.0)


def gauss_newton_match_2d(
    grid: Grid2D,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    initial_pose: Rigid2,
    params: GaussNewtonMatcherParams2D,
    target_translation: jnp.ndarray = None,
) -> Tuple[Rigid2, jnp.ndarray]:
    """Refine `initial_pose` of the scan (points in scan frame) on the grid.

    Anchoring matches ceres_scan_matcher_2d.cc:63-107 exactly: the
    translation penalty pulls toward `target_translation` (the extrapolator
    prediction), while the rotation penalty is anchored at
    `initial_pose.rotation` (the post-correlative estimate) — anchoring
    rotation to the prediction instead silently erases any rotation the
    correlative matcher found.

    Returns (refined_pose, final_cost).
    """
    if target_translation is None:
        target_translation = initial_pose.translation
    grid_prob = grid.probability()
    target_rotation = initial_pose.rotation

    def residual_fn(pose_vec):
        occ = occupied_space_residuals(
            grid_prob, grid, points, mask, pose_vec, params.occupied_space_weight)
        r_t = params.translation_weight * (pose_vec[0:2] - target_translation)
        r_r = params.rotation_weight * (pose_vec[2:3] - target_rotation[None])
        return jnp.concatenate([occ, r_t, r_r])

    x0 = initial_pose.to_vector()
    x, final_cost, _ = lm_solve(
        residual_fn, x0, num_iterations=params.num_iterations,
        nonmonotonic=params.use_nonmonotonic_steps)
    return Rigid2.from_vector(x), final_cost
