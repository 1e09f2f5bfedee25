"""2D truncated signed distance field grid + inserter [KERNEL].

Reference: mapping/internal/2d/tsdf_2d.cc (+ tsd_value_converter.cc),
tsdf_range_data_inserter_2d.cc (projects the SDF along scan normals from
normal_estimation_2d.cc, gaussian-weighted updates), and the TSDF scoring
path of the correlative/Ceres matchers (tsdf_match_cost_function_2d.cc,
interpolated_tsdf_2d.h).

TPU design: normals come from a vectorized angle-sorted neighbor PCA; each
ray updates the K cells within +-truncation of its hit in one shot;
accumulation uses weighted scatter-adds (the running weighted average of
sequential per-ray updates equals the combined scatter-add form exactly).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from cartographer_tpu.ops.interp import interp_bicubic
from cartographer_tpu.sensor.point_cloud import RangeData


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TsdfGrid2D:
    """Per-cell (truncated signed distance, weight); weight 0 = unknown."""

    tsd: jnp.ndarray  # (S, S) float32 in [-truncation, truncation]
    weight: jnp.ndarray  # (S, S) float32 >= 0
    origin: jnp.ndarray  # (2,)
    resolution: float = dataclasses.field(metadata=dict(static=True))
    truncation_distance: float = dataclasses.field(metadata=dict(static=True))
    max_weight: float = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def create(size: int, resolution: float, center,
               truncation_distance: float = 0.3,
               max_weight: float = 10.0) -> "TsdfGrid2D":
        origin = jnp.asarray(center, jnp.float32) - 0.5 * size * resolution
        return TsdfGrid2D(
            tsd=jnp.zeros((size, size), jnp.float32),
            weight=jnp.zeros((size, size), jnp.float32),
            origin=origin, resolution=resolution,
            truncation_distance=truncation_distance, max_weight=max_weight)

    @property
    def size(self) -> int:
        return self.tsd.shape[0]

    def world_to_cell(self, points: jnp.ndarray) -> jnp.ndarray:
        return jnp.floor((points - self.origin) / self.resolution).astype(jnp.int32)

    def world_to_cell_continuous(self, points: jnp.ndarray) -> jnp.ndarray:
        return (points - self.origin) / self.resolution

    @property
    def known(self) -> jnp.ndarray:
        return self.weight > 0

    def known_bounds_numpy(self):
        import numpy as np
        known = np.asarray(self.weight) > 0
        if not known.any():
            return 0, -1, 0, -1
        ii, jj = np.nonzero(known)
        return int(ii.min()), int(ii.max()), int(jj.min()), int(jj.max())

    def correspondence_score(self) -> jnp.ndarray:
        """(S, S) normalized score 1 - |tsd|/truncation, 0 where unknown —
        the TSDF correlative scoring surface (real_time_correlative 2D TSDF
        branch)."""
        score = 1.0 - jnp.abs(self.tsd) / self.truncation_distance
        return jnp.where(self.weight > 0, score, 0.0)

    # Scoring-surface alias so the correlative matcher accepts either grid
    # type (ProbabilityGrid scores mean probability; TSDF scores the
    # normalized 1 - |tsd|, both "higher is better-aligned").
    def probability(self) -> jnp.ndarray:
        return self.correspondence_score()


def estimate_normals_2d(points: jnp.ndarray, mask: jnp.ndarray,
                        origin: jnp.ndarray, num_samples: int = 4,
                        ) -> jnp.ndarray:
    """Per-point 2D normals (normal_estimation_2d.cc): PCA over neighbors in
    scan-angle order, oriented toward the sensor origin. Returns (N, 2) unit
    normals."""
    rel = points - origin[None, :]
    angles = jnp.arctan2(rel[:, 1], rel[:, 0])
    order = jnp.argsort(jnp.where(mask, angles, jnp.inf))
    sorted_pts = points[order]
    n = points.shape[0]
    half = max(1, num_samples // 2)
    idx = jnp.arange(n)
    nbr_offsets = jnp.arange(-half, half + 1)
    nbr_idx = jnp.clip(idx[:, None] + nbr_offsets[None, :], 0, n - 1)
    nbrs = sorted_pts[nbr_idx]  # (N, K, 2)
    mu = jnp.mean(nbrs, axis=1, keepdims=True)
    centered = nbrs - mu
    cov = jnp.einsum("nki,nkj->nij", centered, centered)
    _, vecs = jnp.linalg.eigh(cov)
    normal_sorted = vecs[:, :, 0]  # smallest eigenvector = normal direction
    # Orient towards the sensor.
    to_origin = origin[None, :] - sorted_pts
    flip = jnp.sum(normal_sorted * to_origin, -1) < 0
    normal_sorted = jnp.where(flip[:, None], -normal_sorted, normal_sorted)
    normals = jnp.zeros_like(normal_sorted).at[order].set(normal_sorted)
    return normals


def insert_range_data_tsdf(
    grid: TsdfGrid2D,
    range_data: RangeData,
    update_weight_range_exponent: int = 0,
    angle_kernel_bandwidth: float = 0.5,
    distance_kernel_bandwidth: float = 0.5,
    project_to_normal: bool = True,
    samples_per_ray: int = 16,
) -> TsdfGrid2D:
    """TSDFRangeDataInserter2D::Insert: for each hit, update cells within
    +-truncation along the ray with the signed distance (projected onto the
    estimated surface normal when configured), gaussian-weighted by the
    normal/ray angle and the cell-to-hit distance."""
    hits = range_data.returns
    origin = range_data.origin
    trunc = grid.truncation_distance
    res = grid.resolution
    s = grid.size

    normals = estimate_normals_2d(hits.points, hits.mask, origin)
    rel = hits.points - origin[None, :]
    ray_len = jnp.maximum(jnp.linalg.norm(rel, axis=-1), 1e-6)
    ray_dir = rel / ray_len[:, None]

    # Sample signed distances along each ray in [-truncation, +truncation]
    # around the hit (positive = in front of / before the surface).
    ts = jnp.linspace(-trunc, trunc, samples_per_ray)
    sample_pts = (hits.points[None, :, :]
                  - ts[:, None, None] * ray_dir[None, :, :])  # (K, N, 2)
    if project_to_normal:
        # Signed distance projected on the surface normal, positive on the
        # observed (sensor) side (project_sdf_distance_to_scan_normal).
        sdf = jnp.einsum("knj,nj->kn", hits.points[None] - sample_pts, -normals)
    else:
        sdf = jnp.broadcast_to(ts[:, None], sample_pts.shape[:2])
    sdf = jnp.clip(sdf, -trunc, trunc)

    # Update weights (tsdf_range_data_inserter_2d.cc ComputeWeight): range
    # exponent kernel x angle(normal, ray) gaussian x distance gaussian.
    w_range = jnp.where(
        update_weight_range_exponent == 0, 1.0,
        1.0 / jnp.power(ray_len, update_weight_range_exponent))
    cos_angle = jnp.abs(jnp.sum(normals * (-ray_dir), -1))
    angle = jnp.arccos(jnp.clip(cos_angle, -1.0, 1.0))
    w_angle = jnp.exp(-(angle**2) / (2 * angle_kernel_bandwidth**2))
    w_dist = jnp.exp(-(ts**2)[:, None] / (2 * distance_kernel_bandwidth**2))
    w = (w_range * w_angle)[None, :] * w_dist  # (K, N)
    w = jnp.where(hits.mask[None, :], w, 0.0)

    cells = jnp.floor((sample_pts - grid.origin) / res).astype(jnp.int32)
    inb = ((cells >= 0) & (cells < s)).all(-1)
    lin = jnp.where(inb, cells[..., 0] * s + cells[..., 1], s * s)
    flat = s * s
    w_flat = w.reshape(-1)
    wsum = jnp.zeros(flat + 1).at[lin.reshape(-1)].add(w_flat)[:flat]
    wtsd = jnp.zeros(flat + 1).at[lin.reshape(-1)].add(
        w_flat * sdf.reshape(-1))[:flat]

    old_w = grid.weight.reshape(-1)
    old_tsd = grid.tsd.reshape(-1)
    new_w = old_w + wsum
    new_tsd = jnp.where(new_w > 0, (old_w * old_tsd + wtsd) / jnp.maximum(new_w, 1e-9),
                        old_tsd)
    new_w = jnp.minimum(new_w, grid.max_weight)
    return dataclasses.replace(
        grid, tsd=new_tsd.reshape(s, s), weight=new_w.reshape(s, s))


def gauss_newton_match_tsdf(grid: TsdfGrid2D, points: jnp.ndarray,
                            mask: jnp.ndarray, initial_pose, params,
                            target_translation=None):
    """CeresScanMatcher2D on a TSDF grid (tsdf_match_cost_function_2d.cc):
    same anchoring as the probability-grid matcher, occupied-space term
    replaced by the interpolated signed distance."""
    import jax.numpy as _jnp

    from cartographer_tpu.ops.gauss_newton import lm_solve
    from cartographer_tpu.transform.rigid import Rigid2

    if target_translation is None:
        target_translation = initial_pose.translation
    target_rotation = initial_pose.rotation

    def residual_fn(pose_vec):
        occ = tsdf_residuals(grid, points, mask, pose_vec,
                             params.occupied_space_weight)
        r_t = params.translation_weight * (pose_vec[0:2] - target_translation)
        r_r = params.rotation_weight * (pose_vec[2:3] - target_rotation[None])
        return _jnp.concatenate([occ, r_t, r_r])

    x, cost, _ = lm_solve(residual_fn, initial_pose.to_vector(),
                          num_iterations=params.num_iterations)
    return Rigid2.from_vector(x), cost


def tsdf_residuals(grid: TsdfGrid2D, points: jnp.ndarray, mask: jnp.ndarray,
                   pose_vec: jnp.ndarray, weight: float) -> jnp.ndarray:
    """Per-point TSDF match residual (tsdf_match_cost_function_2d.cc
    interpolates the signed distance). The raw TSD is rescaled by
    0.8 / resolution so its spatial gradient matches the probability-grid
    residual's near-surface slope (d(1-p)/dx ~ (p_max - p_min)/resolution) —
    the shared ceres_scan_matcher weights (translation/rotation anchors) are
    tuned against that slope, and the metric-scale TSD (<= truncation) is
    otherwise overwhelmed by them."""
    from cartographer_tpu.transform.rigid import Rigid2

    pose = Rigid2.from_vector(pose_vec)
    world = pose.apply(points)
    coords = grid.world_to_cell_continuous(world)
    tsd = interp_bicubic(grid.tsd, coords) * (0.8 / grid.resolution)
    n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return jnp.where(mask, (weight / jnp.sqrt(n)) * tsd, 0.0)
