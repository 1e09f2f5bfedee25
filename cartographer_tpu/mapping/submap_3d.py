"""3D submaps: dual-resolution PAGED grids + rotational histogram.

Reference: mapping/3d/submap_3d.{h,cc} — each submap holds a high-resolution
grid (points within high_resolution_max_range), a low-resolution grid, and a
rotational histogram accumulated per scan; ActiveSubmaps3D keeps the
two-submap window (rotate at num_range_data, finish at 2x). The reference's
HybridGrid (mapping/3d/hybrid_grid.h:40-52) is UNBOUNDED — a 3-level sparse
voxel tree.

TPU design: every submap's grids are PagedSubmapGrid3D page pools
(ops/paged_grid_3d.py) — the sparse hybrid-grid semantics at static shapes
(default 204.8 m addressable per side). The dense matching kernels consume
windows gathered on demand with `crop_dense`: the frontend crops around the
CURRENT pose prediction every scan (so tracking never walks out of a fixed
box), and a finished submap snapshots one content-centered dense crop for
the loop-closure pyramid + serialization (tpu.high/low_grid_size are those
crop windows).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from cartographer_tpu.core.config import SubmapsOptions3D, TpuOptions3D
from cartographer_tpu.ops.grid_3d import Grid3D, IntensityGrid3D
from cartographer_tpu.ops.paged_grid_3d import (
    PagedIntensitySubmapGrid3D,
    PagedSubmapGrid3D,
)
from cartographer_tpu.ops.rot_histogram import rotate_histogram


class Submap3D:
    """One 3D submap: paged (sparse, unbounded-extent) grids plus lazy
    content-centered dense crop views.

    `high_grid`/`low_grid` are what the dense loop-closure/matching kernels
    and serialization consume: for a live paged submap they are gathered on
    first access after finish (content-centered, `crop_sizes` window) and
    cached; deserialized submaps set them directly."""

    def __init__(self, local_pose_translation, local_pose_rotation,
                 num_range_data: int = 0, insertion_finished: bool = False,
                 high_paged: Optional[PagedSubmapGrid3D] = None,
                 low_paged: Optional[PagedSubmapGrid3D] = None,
                 high_grid: Optional[Grid3D] = None,
                 low_grid: Optional[Grid3D] = None,
                 histogram: Optional[np.ndarray] = None,
                 crop_sizes: Tuple[int, int] = (256, 192),
                 intensity_paged: Optional[PagedIntensitySubmapGrid3D] = None):
        self.local_pose_translation = local_pose_translation
        self.local_pose_rotation = local_pose_rotation
        self.num_range_data = num_range_data
        self.insertion_finished = insertion_finished
        self.high_paged = high_paged
        self.low_paged = low_paged
        self._high_grid = high_grid
        self._low_grid = low_grid
        self.histogram = histogram
        self._crop_sizes = crop_sizes
        # High-resolution running-average intensity pool (hybrid_grid.h:
        # 547-576 IntensityHybridGrid); None when use_intensities is off.
        self.intensity_paged = intensity_paged
        self._intensity_grid: Optional[IntensityGrid3D] = None

    @property
    def high_grid(self) -> Optional[Grid3D]:
        if (self._high_grid is None and self.insertion_finished
                and self.high_paged is not None):
            self._high_grid = self.high_paged.crop_dense(
                self.high_paged.known_center(), self._crop_sizes[0])
        return self._high_grid

    @high_grid.setter
    def high_grid(self, grid) -> None:
        self._high_grid = grid

    @property
    def low_grid(self) -> Optional[Grid3D]:
        if (self._low_grid is None and self.insertion_finished
                and self.low_paged is not None):
            self._low_grid = self.low_paged.crop_dense(
                self.low_paged.known_center(), self._crop_sizes[1])
        return self._low_grid

    @low_grid.setter
    def low_grid(self, grid) -> None:
        self._low_grid = grid

    @property
    def intensity_grid(self) -> Optional[IntensityGrid3D]:
        """Content-centered dense crop of the intensity pool, aligned with
        `high_grid`'s window (same center and size) so the two sample the
        same space in the matcher."""
        if (self._intensity_grid is None and self.insertion_finished
                and self.intensity_paged is not None
                and self.high_paged is not None):
            self._intensity_grid = self.intensity_paged.crop_dense(
                self.high_paged.known_center(), self._crop_sizes[0])
        return self._intensity_grid

    @intensity_grid.setter
    def intensity_grid(self, grid) -> None:
        self._intensity_grid = grid


class ActiveSubmaps3D:
    def __init__(self, options: SubmapsOptions3D, tpu: TpuOptions3D,
                 histogram_size: int = 120, use_intensities: bool = False):
        self._options = options
        self._tpu = tpu
        self._histogram_size = histogram_size
        self._use_intensities = use_intensities
        self.submaps: List[Submap3D] = []
        self._histograms: List[np.ndarray] = []

    def _new_paged(self, center: np.ndarray) -> Tuple[PagedSubmapGrid3D,
                                                      PagedSubmapGrid3D]:
        t = self._tpu
        high = PagedSubmapGrid3D(
            self._options.high_resolution, center, page_size=t.page_size,
            max_pages=t.max_pages, num_blocks=t.num_blocks)
        low = PagedSubmapGrid3D(
            self._options.low_resolution, center, page_size=t.page_size,
            max_pages=t.max_pages, num_blocks=t.num_blocks)
        return high, low

    def matching_grids_at(self, center) -> Optional[
            Tuple[Grid3D, Grid3D, Optional[IntensityGrid3D]]]:
        """Dense (high, low, intensity|None) crops of the MATCHING (oldest
        active) submap around `center` — the scan's predicted pose, so the
        usable matching window follows the robot instead of the submap
        origin. The intensity crop shares the high-resolution window
        (local_trajectory_builder_3d.cc:489-500 passes the matching submap's
        high_resolution_intensity_hybrid_grid)."""
        if not self.submaps:
            return None
        s = self.submaps[0]
        intensity = (s.intensity_paged.crop_dense(
            center, self._tpu.high_grid_size)
            if s.intensity_paged is not None else None)
        return (s.high_paged.crop_dense(center, self._tpu.high_grid_size),
                s.low_paged.crop_dense(center, self._tpu.low_grid_size),
                intensity)

    @property
    def matching_histogram(self) -> np.ndarray:
        return self._histograms[0]

    def insert_range_data(self, origin_local: jnp.ndarray,
                          points_local: jnp.ndarray, mask: jnp.ndarray,
                          scan_histogram: np.ndarray,
                          scan_yaw_in_local: float,
                          intensities: Optional[np.ndarray] = None,
                          rotated_histogram: Optional[np.ndarray] = None
                          ) -> List[Submap3D]:
        """Insert a local-frame scan into both active submaps; returns newly
        finished submaps (ActiveSubmaps3D::InsertData, submap_3d.cc)."""
        finished: List[Submap3D] = []
        if not self.submaps or (
                self.submaps[-1].num_range_data == self._options.num_range_data):
            self._add_submap(np.asarray(origin_local))

        ins = self._options.range_data_inserter
        origin_np = np.asarray(origin_local, np.float32)
        points_np = np.asarray(points_local, np.float32)
        mask_np = np.asarray(mask)
        # High-resolution grid only keeps points within its range gate
        # (submap_3d.cc high_resolution_max_range).
        in_high = (np.linalg.norm(points_np - origin_np[None, :], axis=-1)
                   <= self._options.high_resolution_max_range)
        # The fused frontend pre-rotates on device (one packed fetch); the
        # fallback round-trips here for direct callers.
        rotated = (np.asarray(rotated_histogram)
                   if rotated_histogram is not None
                   else np.asarray(rotate_histogram(
                       jnp.asarray(scan_histogram), scan_yaw_in_local)))
        for i, submap in enumerate(self.submaps):
            submap.high_paged.insert_range_data(
                origin_np, points_np, mask_np & in_high,
                hit_probability=ins.hit_probability,
                miss_probability=ins.miss_probability,
                num_free_space_voxels=ins.num_free_space_voxels)
            submap.low_paged.insert_range_data(
                origin_np, points_np, mask_np,
                hit_probability=ins.hit_probability,
                miss_probability=ins.miss_probability,
                num_free_space_voxels=ins.num_free_space_voxels)
            if submap.intensity_paged is not None and intensities is not None:
                # High-resolution grid only (range_data_inserter_3d.cc:119
                # passes the intensity grid alongside the high-res insert);
                # same range gate as the occupancy high grid.
                submap.intensity_paged.insert(
                    points_np, np.asarray(intensities, np.float32),
                    mask_np & in_high, ins.intensity_threshold)
            submap.num_range_data += 1
            # Histogram accumulates the scan histogram rotated into the
            # submap frame (submap_3d.h:95-104; submaps are yaw-anchored at
            # identity, so the scan yaw is the rotation).
            self._histograms[i] += rotated

        front = self.submaps[0]
        if (not front.insertion_finished
                and front.num_range_data == 2 * self._options.num_range_data):
            self._finish(0)
            finished.append(front)
        return finished

    def _finish(self, i: int) -> None:
        """Finish a submap: compact its page pools (only the allocated
        pages survive — bounded memory per finished submap) and stamp the
        histogram; the dense crop views materialize lazily on first use."""
        submap = self.submaps[i]
        submap.insertion_finished = True
        submap.high_paged.compact()
        submap.low_paged.compact()
        if submap.intensity_paged is not None:
            # The reference FORGETS the intensity grid once a submap leaves
            # the active window (submap_3d.cc:400-404) purely to save RAM;
            # the compacted page pool is small, so we keep it (serializable,
            # and still available if the submap is re-matched).
            submap.intensity_paged.compact()
        submap.histogram = self._histograms[i].copy()

    def _add_submap(self, origin: np.ndarray) -> None:
        if len(self.submaps) == 2:
            self.submaps.pop(0)
            self._histograms.pop(0)
        high, low = self._new_paged(np.asarray(origin, np.float32))
        intensity = None
        if self._use_intensities:
            t = self._tpu
            intensity = PagedIntensitySubmapGrid3D(
                self._options.high_resolution, np.asarray(origin, np.float32),
                page_size=t.page_size, max_pages=t.max_pages,
                num_blocks=t.num_blocks)
        self.submaps.append(Submap3D(
            local_pose_translation=np.asarray(origin, float),
            local_pose_rotation=np.array([1.0, 0, 0, 0]),
            high_paged=high, low_paged=low,
            crop_sizes=(self._tpu.high_grid_size, self._tpu.low_grid_size),
            intensity_paged=intensity))
        self._histograms.append(np.zeros(self._histogram_size))

    def finish_all(self) -> List[Submap3D]:
        finished = []
        for i, submap in enumerate(self.submaps):
            if not submap.insertion_finished:
                self._finish(i)
                finished.append(submap)
        return finished
