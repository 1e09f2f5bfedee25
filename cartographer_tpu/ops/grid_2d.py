"""Dense 2D occupancy grid + raycast insertion [KERNEL].

Reference equivalents: mapping/2d/grid_2d.{h,cc}, probability_grid.cc,
probability_grid_range_data_inserter_2d.cc and the superscaled-Bresenham
raycaster ray_to_pixel_mask.cc.

TPU design decisions:
- The grid is a fixed-size square float32 log-odds array (static shape).
  The reference grows grids on demand (`GrowLimits`); here submaps allocate
  their full extent up front and out-of-bounds points are dropped by masked
  scatters — submaps are local by construction so a generous fixed extent
  (config `submap_grid_size`) replaces dynamic growth.
- The reference's "update marker" (each cell at most once per scan) becomes
  two scatter-max one-hot passes: a hit mask and a free mask; cells update
  once with hit taking precedence over miss, exactly the reference semantics
  (CastRays applies hit table to returns, miss table to the ray cells).
- Bresenham raycasting becomes uniform sampling along each ray at >= 2
  samples per cell width, batched over (rays x samples) and reduced with a
  scatter-max — O(N*K) fully-parallel work instead of a sequential walk.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.ops.probability import (
    MAX_LOG_ODDS,
    MIN_LOG_ODDS,
    UNKNOWN_PROBABILITY,
    clamp_log_odds,
    log_odds_to_probability,
    probability_to_log_odds,
)
from cartographer_tpu.sensor.point_cloud import RangeData


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grid2D:
    """Square log-odds occupancy grid in a local (submap) frame.

    Cell (i, j) covers world [origin + (i, j) * resolution, + resolution);
    i indexes x, j indexes y. `known` marks ever-updated cells; unknown
    cells score as UNKNOWN_PROBABILITY when matching.
    """

    log_odds: jnp.ndarray  # (S, S) float32
    known: jnp.ndarray  # (S, S) bool
    origin: jnp.ndarray  # (2,) float32, world position of cell (0, 0) corner
    resolution: float = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def create(size: int, resolution: float, center: jnp.ndarray) -> "Grid2D":
        origin = jnp.asarray(center, jnp.float32) - 0.5 * size * resolution
        return Grid2D(
            log_odds=jnp.zeros((size, size), jnp.float32),
            known=jnp.zeros((size, size), bool),
            origin=origin,
            resolution=resolution,
        )

    @property
    def size(self) -> int:
        return self.log_odds.shape[0]

    def world_to_cell(self, points: jnp.ndarray) -> jnp.ndarray:
        """World (..., 2) -> integer cell indices (..., 2) (floor)."""
        return jnp.floor((points - self.origin) / self.resolution).astype(jnp.int32)

    def world_to_cell_continuous(self, points: jnp.ndarray) -> jnp.ndarray:
        """World (..., 2) -> fractional cell coordinates (cell centers at .5)."""
        return (points - self.origin) / self.resolution

    def cell_center(self, cells: jnp.ndarray) -> jnp.ndarray:
        return self.origin + (cells.astype(jnp.float32) + 0.5) * self.resolution

    def in_bounds(self, cells: jnp.ndarray) -> jnp.ndarray:
        s = self.size
        return (
            (cells[..., 0] >= 0) & (cells[..., 0] < s)
            & (cells[..., 1] >= 0) & (cells[..., 1] < s)
        )

    def probability(self) -> jnp.ndarray:
        """(S, S) probability grid for scoring; unknown -> UNKNOWN_PROBABILITY."""
        return jnp.where(
            self.known, log_odds_to_probability(self.log_odds), UNKNOWN_PROBABILITY
        ).astype(jnp.float32)

    def known_bounds_numpy(self) -> Tuple[int, int, int, int]:
        """Host-side bounding box (imin, imax, jmin, jmax) inclusive of known
        cells; used to crop finished submaps (Grid2D::ComputeCroppedLimits)."""
        known = np.asarray(self.known)
        if not known.any():
            return 0, -1, 0, -1
        ii, jj = np.nonzero(known)
        return int(ii.min()), int(ii.max()), int(jj.min()), int(jj.max())


def insert_range_data(
    grid: Grid2D,
    range_data: RangeData,
    hit_probability: float = 0.55,
    miss_probability: float = 0.49,
    insert_free_space: bool = True,
    ray_samples: int = 600,
    method: str = "auto",
    polar_bins: int = 1024,
) -> Grid2D:
    """Insert one scan (already in the grid frame) into the grid.

    Equivalent of ProbabilityGridRangeDataInserter2D::Insert
    (mapping/2d/probability_grid_range_data_inserter_2d.cc:119-136):
    returns get the hit update, cells along every ray (and miss-ray
    endpoints) get the miss update, each cell updated at most once per scan.
    `ray_samples` must be >= 2 * max_ray_length / resolution for full ray
    coverage (the driver computes it from the config).

    method:
      - "polar" (TPU default): free space via polar rasterization — a per-bin
        range image from the scan, then every cell closer than its bin's
        range is free. One small scatter-min (N elements) plus one-hot
        matmuls; ~5x less HBM traffic than per-ray sampling. Semantics match
        ray casting except at occlusion boundaries (polar stops at the
        nearest return per angular bin, which real rays cannot pass either).
      - "mxu": per-ray sampling with count-image matmuls (no scatters).
      - "scatter": the direct port of the reference's raycast (CPU default,
        and the executable spec the others are tested against).
    """
    if method == "auto":
        method = "polar" if jax.default_backend() == "tpu" else "scatter"
    if method == "polar":
        return _insert_range_data_polar(
            grid, range_data, hit_probability, miss_probability,
            insert_free_space, num_bins=polar_bins)
    s = grid.size
    flat_shape = s * s

    if method == "mxu":
        from cartographer_tpu.ops.onehot import occupancy_mask, occupancy_mask_chunked

        def mask_of(cells, valid):
            return occupancy_mask(cells, valid, s)

        def mask_of_large(cells, valid):
            return occupancy_mask_chunked(cells, valid, s)
    else:
        def scatter_mask(cells: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
            lin = cells[..., 0] * s + cells[..., 1]
            lin = jnp.where(valid & ((cells[..., 0] >= 0) & (cells[..., 0] < s)
                                     & (cells[..., 1] >= 0) & (cells[..., 1] < s)),
                            lin, flat_shape)
            out = jnp.zeros(flat_shape + 1, jnp.bool_)
            return out.at[lin.reshape(-1)].set(True)[:flat_shape].reshape(s, s)

        mask_of = scatter_mask
        mask_of_large = scatter_mask

    hits = range_data.returns
    hit_cells = grid.world_to_cell(hits.points)
    hit_mask = mask_of(hit_cells, hits.mask)

    if insert_free_space:
        # Free-space samples along each return ray [origin, hit) and each miss
        # ray [origin, end].
        def ray_free_cells(points, mask, include_end):
            delta = points - range_data.origin
            if include_end:
                t = (jnp.arange(ray_samples, dtype=jnp.float32) + 1.0) / ray_samples
            else:
                t = jnp.arange(ray_samples, dtype=jnp.float32) / ray_samples
            samples = range_data.origin + t[:, None, None] * delta[None, :, :]
            cells = grid.world_to_cell(samples)  # (K, N, 2)
            valid = jnp.broadcast_to(mask[None, :], cells.shape[:-1])
            return mask_of_large(cells.reshape(-1, 2), valid.reshape(-1))

        free_mask = ray_free_cells(hits.points, hits.mask, include_end=False)
        misses = range_data.misses
        free_mask = free_mask | ray_free_cells(misses.points, misses.mask, include_end=True)
        free_mask = free_mask & ~hit_mask
    else:
        free_mask = jnp.zeros((s, s), bool)

    return _apply_masks(grid, hit_mask, free_mask, hit_probability, miss_probability)


def _apply_masks(grid: Grid2D, hit_mask, free_mask, hit_probability,
                 miss_probability) -> Grid2D:
    hit_lo = probability_to_log_odds(jnp.float32(hit_probability))
    miss_lo = probability_to_log_odds(jnp.float32(miss_probability))
    log_odds = clamp_log_odds(
        grid.log_odds
        + jnp.where(hit_mask, hit_lo, 0.0)
        + jnp.where(free_mask, miss_lo, 0.0)
    )
    return dataclasses.replace(
        grid, log_odds=log_odds, known=grid.known | hit_mask | free_mask
    )


def _insert_range_data_polar(
    grid: Grid2D,
    range_data: RangeData,
    hit_probability: float,
    miss_probability: float,
    insert_free_space: bool,
    num_bins: int = 1024,
) -> Grid2D:
    """Polar free-space rasterization (see insert_range_data docstring)."""
    from cartographer_tpu.ops.onehot import occupancy_mask

    s = grid.size
    hits = range_data.returns
    hit_cells = grid.world_to_cell(hits.points)
    hit_mask = occupancy_mask(hit_cells, hits.mask, s)

    if not insert_free_space:
        return _apply_masks(grid, hit_mask, jnp.zeros((s, s), bool),
                            hit_probability, miss_probability)

    res = grid.resolution
    origin = range_data.origin

    def bins_and_ranges(points, mask, extra):
        d = points - origin
        r = jnp.linalg.norm(d, axis=-1)
        theta = jnp.arctan2(d[..., 1], d[..., 0])
        b = jnp.clip(((theta + jnp.pi) * (num_bins / (2 * jnp.pi))).astype(jnp.int32),
                     0, num_bins - 1)
        return b, jnp.where(mask, r + extra, -jnp.inf)

    # Range image: per-bin nearest return (free space stops there); miss rays
    # free through their endpoint (+0.6 cell margin covers the end cell).
    hb, hr = bins_and_ranges(hits.points, hits.mask, extra=0.0)
    mb, mr = bins_and_ranges(range_data.misses.points, range_data.misses.mask,
                             extra=0.6 * res)
    range_img = jnp.full(num_bins, jnp.inf)
    range_img = range_img.at[hb].min(jnp.where(jnp.isfinite(hr), hr, jnp.inf))
    range_img = range_img.at[mb].min(jnp.where(jnp.isfinite(mr), mr, jnp.inf))
    range_img = jnp.where(jnp.isfinite(range_img), range_img, 0.0)
    # +-1-bin max dilation: a ray's 1-cell-wide free line covers cells whose
    # centers fall in the adjacent angular bin (bin width < cell width at
    # typical ranges).
    range_img = jnp.maximum(range_img,
                            jnp.maximum(jnp.roll(range_img, 1),
                                        jnp.roll(range_img, -1)))

    # Every cell whose center is closer than its bin's range is free.
    ii = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    centers_x = grid.origin[0] + (ii.astype(jnp.float32) + 0.5) * res
    centers_y = grid.origin[1] + (jj.astype(jnp.float32) + 0.5) * res
    dx = centers_x - origin[0]
    dy = centers_y - origin[1]
    r_cell = jnp.sqrt(dx * dx + dy * dy)
    theta_cell = jnp.arctan2(dy, dx)
    bin_cell = jnp.clip(
        ((theta_cell + jnp.pi) * (num_bins / (2 * jnp.pi))).astype(jnp.int32),
        0, num_bins - 1)
    # Per-cell range-image threshold via the factored two-level lookup
    # (ops/onehot.table_lookup): exact, gather-free, ~4x cheaper than a flat
    # one-hot contraction over all bins.
    from cartographer_tpu.ops.onehot import table_lookup

    thresholds = table_lookup(range_img.astype(jnp.float32), bin_cell)
    free_mask = (r_cell < thresholds - 0.5 * res) & ~hit_mask
    return _apply_masks(grid, hit_mask, free_mask, hit_probability, miss_probability)
