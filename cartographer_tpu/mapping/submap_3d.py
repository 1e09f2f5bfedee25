"""3D submaps: dual-resolution grids + rotational histogram.

Reference: mapping/3d/submap_3d.{h,cc} — each submap holds a high-resolution
grid (points within high_resolution_max_range), a low-resolution grid, an
optional intensity grid, and a rotational histogram accumulated per scan;
ActiveSubmaps3D keeps the two-submap window (rotate at num_range_data,
finish at 2x).

TPU design: both submaps' grids are batched pytrees (leading dim 2) so one
vmapped device call inserts a scan into every grid, mirroring submap_2d.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.core.config import SubmapsOptions3D, TpuOptions3D
from cartographer_tpu.ops.grid_3d import Grid3D, insert_range_data_3d
from cartographer_tpu.ops.rot_histogram import rotate_histogram


@dataclasses.dataclass
class Submap3D:
    local_pose_translation: np.ndarray  # (3,)
    local_pose_rotation: np.ndarray  # (4,)
    num_range_data: int = 0
    insertion_finished: bool = False
    high_grid: Optional[Grid3D] = None  # set on finish
    low_grid: Optional[Grid3D] = None
    histogram: Optional[np.ndarray] = None


class ActiveSubmaps3D:
    def __init__(self, options: SubmapsOptions3D, tpu: TpuOptions3D,
                 histogram_size: int = 120):
        self._options = options
        self._tpu = tpu
        self._histogram_size = histogram_size
        self.submaps: List[Submap3D] = []
        self._high: Optional[Grid3D] = None  # batched (2, S, S, S)
        self._low: Optional[Grid3D] = None
        self._histograms = np.zeros((2, histogram_size))
        ins = options.range_data_inserter

        def insert_one(high, low, origin, points, mask, active):
            in_high_range = (
                jnp.linalg.norm(points - origin[None, :], axis=-1)
                <= options.high_resolution_max_range)
            new_high = insert_range_data_3d(
                high, origin, points, mask & in_high_range,
                hit_probability=ins.hit_probability,
                miss_probability=ins.miss_probability,
                num_free_space_voxels=ins.num_free_space_voxels)
            new_low = insert_range_data_3d(
                low, origin, points, mask,
                hit_probability=ins.hit_probability,
                miss_probability=ins.miss_probability,
                num_free_space_voxels=ins.num_free_space_voxels)
            keep = lambda old, new: jax.tree_util.tree_map(
                lambda o, n: jnp.where(active, n, o), old, new)
            return keep(high, new_high), keep(low, new_low)

        self._insert_fn = jax.jit(
            jax.vmap(insert_one, in_axes=(0, 0, None, None, None, 0)),
            donate_argnums=(0, 1))

    def _blank(self, center):
        high = Grid3D.create(self._tpu.high_grid_size,
                             self._options.high_resolution, center)
        low = Grid3D.create(self._tpu.low_grid_size,
                            self._options.low_resolution, center)
        return high, low

    def _set_slot(self, slot, high, low):
        if self._high is None:
            self._high = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), high)
            self._low = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), low)
        else:
            self._high = jax.tree_util.tree_map(
                lambda a, o: a.at[slot].set(o), self._high, high)
            self._low = jax.tree_util.tree_map(
                lambda a, o: a.at[slot].set(o), self._low, low)

    def _grid_at(self, slot):
        return (jax.tree_util.tree_map(lambda x: x[slot], self._high),
                jax.tree_util.tree_map(lambda x: x[slot], self._low))

    @property
    def matching_grids(self):
        if self._high is None:
            return None
        return self._grid_at(0)

    @property
    def matching_histogram(self) -> np.ndarray:
        return self._histograms[0]

    def insert_range_data(self, origin_local: jnp.ndarray,
                          points_local: jnp.ndarray, mask: jnp.ndarray,
                          scan_histogram: np.ndarray,
                          scan_yaw_in_local: float) -> List[Submap3D]:
        """Insert a local-frame scan into both active submaps; returns newly
        finished submaps (ActiveSubmaps3D::InsertData, submap_3d.cc)."""
        finished: List[Submap3D] = []
        if not self.submaps or (
                self.submaps[-1].num_range_data == self._options.num_range_data):
            self._add_submap(np.asarray(origin_local))

        active = jnp.asarray([True, len(self.submaps) > 1], bool)
        self._high, self._low = self._insert_fn(
            self._high, self._low, origin_local, points_local, mask, active)
        # Histogram accumulates the scan histogram rotated into the submap
        # frame (submap_3d.h:95-104 rotation semantics; our submaps are
        # yaw-anchored at identity, so the scan yaw is the rotation).
        rotated = np.asarray(rotate_histogram(
            jnp.asarray(scan_histogram), scan_yaw_in_local))
        for i, submap in enumerate(self.submaps):
            submap.num_range_data += 1
            self._histograms[i] += rotated

        front = self.submaps[0]
        if (not front.insertion_finished
                and front.num_range_data == 2 * self._options.num_range_data):
            front.insertion_finished = True
            front.high_grid, front.low_grid = self._grid_at(0)
            front.histogram = self._histograms[0].copy()
            finished.append(front)
        return finished

    def _add_submap(self, origin: np.ndarray) -> None:
        if len(self.submaps) == 2:
            self.submaps.pop(0)
            h1, l1 = self._grid_at(1)
            self._set_slot(0, h1, l1)
            self._histograms[0] = self._histograms[1]
        new = Submap3D(
            local_pose_translation=np.asarray(origin, float),
            local_pose_rotation=np.array([1.0, 0, 0, 0]))
        self.submaps.append(new)
        slot = len(self.submaps) - 1
        high, low = self._blank(np.asarray(origin, np.float32))
        self._set_slot(slot, high, low)
        self._histograms[slot] = 0.0
        if len(self.submaps) == 1:
            self._set_slot(1, high, low)
            self._histograms[1] = 0.0

    def finish_all(self) -> List[Submap3D]:
        finished = []
        for i, submap in enumerate(self.submaps):
            if not submap.insertion_finished:
                submap.insertion_finished = True
                submap.high_grid, submap.low_grid = self._grid_at(i)
                submap.histogram = self._histograms[i].copy()
                finished.append(submap)
        return finished
