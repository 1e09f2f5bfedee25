"""3D scan matching kernels: SE(3) Gauss-Newton refine + real-time
correlative search [KERNEL].

Reference: mapping/internal/3d/scan_matching/ceres_scan_matcher_3d.cc
(trilinear occupied-space residuals on high+low resolution grids, optional
intensity residual, translation/rotation penalties, optional yaw-only
parameterization) and real_time_correlative_scan_matcher_3d.cc (exhaustive
(x, y, z, rx, ry, rz) candidate scoring).

TPU design: SE(3) optimization runs on the 6-dim tangent [dt, so3] via the
generic LM solver differentiating through trilinear interpolation; the
correlative search is one batched gather over the full candidate tensor.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from cartographer_tpu.ops.gauss_newton import lm_solve
from cartographer_tpu.ops.grid_3d import Grid3D, IntensityGrid3D
from cartographer_tpu.ops.interp import interp_trilinear
from cartographer_tpu.ops.probability import UNKNOWN_PROBABILITY
from cartographer_tpu.transform import quaternion as quat
from cartographer_tpu.transform.rigid import Rigid3


@dataclasses.dataclass(frozen=True)
class GaussNewtonMatcherParams3D:
    occupied_space_weight_0: float = 1.0  # high resolution
    occupied_space_weight_1: float = 6.0  # low resolution
    intensity_weight: float = 0.0  # 0 = disabled
    intensity_huber_scale: float = 0.3
    intensity_threshold: float = 40.0
    translation_weight: float = 5.0
    rotation_weight: float = 4e2
    only_optimize_yaw: bool = False
    num_iterations: int = 12
    use_nonmonotonic_steps: bool = False  # ceres_solver_options


def se3_retract(pose: Rigid3, delta: jnp.ndarray) -> Rigid3:
    """Boxplus: translation += dt, rotation = q * exp(so3)."""
    return Rigid3(
        pose.translation + delta[0:3],
        quat.normalize(quat.multiply(pose.rotation, quat.from_axis_angle(delta[3:6]))),
    )


def _occupied_residuals(grid_prob, grid: Grid3D, points, mask, pose: Rigid3, weight):
    world = pose.apply(points)
    coords = grid.world_to_cell_continuous(world)
    p = interp_trilinear(grid_prob, coords)
    n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return jnp.where(mask, (weight / jnp.sqrt(n)) * (1.0 - p), 0.0)


def gauss_newton_match_3d(
    high_grid: Grid3D,
    low_grid: Grid3D,
    high_points: jnp.ndarray,  # (Nh, 3) scan frame
    high_mask: jnp.ndarray,
    low_points: jnp.ndarray,  # (Nl, 3)
    low_mask: jnp.ndarray,
    initial_pose: Rigid3,
    params: GaussNewtonMatcherParams3D,
    target_translation: jnp.ndarray = None,
    intensity_grid: Optional[IntensityGrid3D] = None,
    high_intensities: Optional[jnp.ndarray] = None,
) -> Tuple[Rigid3, jnp.ndarray]:
    """CeresScanMatcher3D::Match equivalent. Anchoring mirrors the 2D case:
    translation penalty to the prediction, rotation penalty to the initial
    estimate."""
    if target_translation is None:
        target_translation = initial_pose.translation
    high_prob = high_grid.probability()
    low_prob = low_grid.probability()
    target_rotation = initial_pose.rotation
    if intensity_grid is not None and params.intensity_weight > 0:
        intensity_avg = intensity_grid.average()

    def residual_fn(pose: Rigid3):
        parts = [
            _occupied_residuals(high_prob, high_grid, high_points, high_mask,
                                pose, params.occupied_space_weight_0),
            _occupied_residuals(low_prob, low_grid, low_points, low_mask,
                                pose, params.occupied_space_weight_1),
        ]
        if intensity_grid is not None and params.intensity_weight > 0:
            world = pose.apply(high_points)
            coords = (world - intensity_grid.origin) / intensity_grid.resolution
            pred = interp_trilinear(intensity_avg, coords)
            m = high_mask & (high_intensities <= params.intensity_threshold)
            n = jnp.maximum(jnp.sum(m.astype(jnp.float32)), 1.0)
            r = pred - high_intensities
            # Huber via IRLS-style soft clipping of the residual. The sqrt
            # argument is guarded with the double-where pattern: sqrt'(0) is
            # inf, and a plain maximum(·, 0) still leaks NaN through jacfwd
            # for every inlier residual.
            scale = params.intensity_huber_scale
            arg = scale * (jnp.abs(r) - scale)
            outlier = arg > 0
            soft = jnp.where(outlier,
                             jnp.sqrt(jnp.where(outlier, arg, 1.0)), 0.0)
            r = jnp.sign(r) * jnp.minimum(jnp.abs(r), scale + soft)
            parts.append(jnp.where(m, (params.intensity_weight / jnp.sqrt(n)) * r, 0.0))
        r_t = params.translation_weight * (pose.translation - target_translation)
        # Rotation penalty: angle of q_target^-1 * q via axis-angle norm.
        dq = quat.multiply(quat.conjugate(target_rotation), pose.rotation)
        r_r = params.rotation_weight * quat.to_axis_angle(dq)
        parts.extend([r_t, r_r])
        return jnp.concatenate(parts)

    if params.only_optimize_yaw:
        # Constrain updates to [dt, yaw] (rotation_parameterization.h).
        def retract(pose, delta4):
            delta6 = jnp.concatenate([
                delta4[0:3], jnp.zeros(2), delta4[3:4]])
            return se3_retract(pose, delta6)
        tangent_dim = 4
    else:
        retract = se3_retract
        tangent_dim = 6

    pose, final_cost, _ = lm_solve(
        residual_fn, initial_pose, retract_fn=retract, tangent_dim=tangent_dim,
        num_iterations=params.num_iterations,
        nonmonotonic=params.use_nonmonotonic_steps)
    return pose, final_cost


@dataclasses.dataclass(frozen=True)
class CorrelativeSearchParams3D:
    linear_search_window: float = 0.15
    angular_search_window: float = 0.0175  # math.rad(1.)
    translation_delta_cost_weight: float = 1e-1
    rotation_delta_cost_weight: float = 1e-1
    max_scan_range: float = 60.0


def real_time_correlative_match_3d(
    grid: Grid3D,
    points: jnp.ndarray,  # (N, 3) scan frame
    mask: jnp.ndarray,
    initial_pose: Rigid3,
    params: CorrelativeSearchParams3D,
) -> Tuple[jnp.ndarray, Rigid3]:
    """Exhaustive (x,y,z,rx,ry,rz) scoring
    (real_time_correlative_scan_matcher_3d.cc:52-117). Candidate counts are
    static (derived from max_scan_range); the per-scan angular step is
    dynamic with out-of-window candidates masked."""
    import math

    res = grid.resolution
    nl = int(math.ceil(params.linear_search_window / res))
    static_step = (1.0 - 1e-3) * math.acos(
        1.0 - res**2 / (2.0 * params.max_scan_range**2))
    na = int(round(params.angular_search_window / static_step))

    ranges = jnp.linalg.norm(points, axis=-1)
    max_range = jnp.maximum(jnp.max(jnp.where(mask, ranges, 0.0)), 3.0 * res)
    step = (1.0 - 1e-3) * jnp.arccos(1.0 - res**2 / (2.0 * max_range**2))

    lin = jnp.arange(-nl, nl + 1).astype(jnp.float32) * res
    ang = jnp.arange(-na, na + 1).astype(jnp.float32) * step
    ang_valid = jnp.abs(ang) <= params.angular_search_window + 1e-6

    # Rotation candidates (A^3, 4) then rotated clouds (A^3, N, 3).
    rx, ry, rz = jnp.meshgrid(ang, ang, ang, indexing="ij")
    aa = jnp.stack([rx.reshape(-1), ry.reshape(-1), rz.reshape(-1)], -1)
    qs = quat.from_axis_angle(aa)  # (R, 4)
    rot_valid = (ang_valid[:, None, None] & ang_valid[None, :, None]
                 & ang_valid[None, None, :]).reshape(-1)

    prob = grid.probability()
    s = grid.size
    shifts = jnp.arange(-nl, nl + 1)
    num = jnp.maximum(jnp.sum(mask), 1)
    dist = jnp.sqrt(lin[:, None, None] ** 2 + lin[None, :, None] ** 2
                    + lin[None, None, :] ** 2)
    angle = jnp.linalg.norm(aa, axis=-1)

    # Stream over rotation candidates (R can be ~10^4): each step scores the
    # full (X, Y, Z) translation window for one rotation — bounded memory,
    # sequential-over-R like the reference's outer loop but with the inner
    # triple loop fully vectorized.
    def score_rotation(args):
        q, ang_norm, valid = args
        rotated = quat.rotate(initial_pose.rotation[None, :],
                              quat.rotate(q[None, :], points))
        world = rotated + initial_pose.translation[None, :]
        base_cells = grid.world_to_cell(world)  # (N, 3)
        cx = base_cells[None, None, None, :, 0] + shifts[:, None, None, None]
        cy = base_cells[None, None, None, :, 1] + shifts[None, :, None, None]
        cz = base_cells[None, None, None, :, 2] + shifts[None, None, :, None]
        inb = ((cx >= 0) & (cx < s) & (cy >= 0) & (cy < s)
               & (cz >= 0) & (cz < s))
        p = jnp.where(inb, prob[jnp.clip(cx, 0, s - 1), jnp.clip(cy, 0, s - 1),
                                jnp.clip(cz, 0, s - 1)], UNKNOWN_PROBABILITY)
        raw = jnp.sum(jnp.where(mask[None, None, None, :], p, 0.0), -1) / num
        penalty = jnp.exp(-((dist * params.translation_delta_cost_weight
                             + ang_norm * params.rotation_delta_cost_weight) ** 2))
        scores = jnp.where(valid, raw * penalty, -jnp.inf)
        best = jnp.argmax(scores)
        ix, iy, iz = jnp.unravel_index(best, scores.shape)
        return scores[ix, iy, iz], jnp.stack([lin[ix], lin[iy], lin[iz]])

    best_scores, best_offsets = jax.lax.map(
        score_rotation, (qs, angle, rot_valid), batch_size=64)
    r = jnp.argmax(best_scores)
    best_pose = Rigid3(
        initial_pose.translation + best_offsets[r],
        quat.normalize(quat.multiply(initial_pose.rotation, qs[r])),
    )
    return best_scores[r], best_pose
