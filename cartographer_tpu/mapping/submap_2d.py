"""2D submaps and the two-submap active window.

Reference: mapping/2d/submap_2d.{h,cc} — ActiveSubmaps2D keeps two submaps:
the older one (used for matching) and a newer one being initialized; a new
submap starts every `num_range_data` inserted scans and a submap is finished
after 2 * num_range_data scans.

TPU design: both active grids live stacked in one batched Grid2D pytree
(leading dim 2) so a scan inserts into both with a single vmapped device
call; an active-mask handles the startup phase when only one submap exists.
Finished submaps are snapshotted to host memory (cropped numpy arrays) for
the pose graph / serialization.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.core.config import SubmapsOptions2D, TpuOptions2D
from cartographer_tpu.core.time import Time
from cartographer_tpu.ops.grid_2d import Grid2D, insert_range_data
from cartographer_tpu.sensor.point_cloud import RangeData


@dataclasses.dataclass
class Submap2D:
    """Host-side submap handle (grid may live on device until finished)."""

    local_pose_translation: np.ndarray  # (3,) pose of submap origin in local frame
    local_pose_rotation: np.ndarray  # (4,) quaternion (gravity alignment at creation)
    num_range_data: int = 0
    insertion_finished: bool = False
    grid: Optional[Grid2D] = None  # set on finish (device or host snapshot)


def _make_insert_body(hit_probability, miss_probability, insert_free_space, ray_samples):
    def insert_one(grid: Grid2D, rd: RangeData, active: jnp.ndarray) -> Grid2D:
        new = insert_range_data(
            grid, rd,
            hit_probability=hit_probability,
            miss_probability=miss_probability,
            insert_free_space=insert_free_space,
            ray_samples=ray_samples)
        # Inactive slots keep their previous contents.
        return jax.tree_util.tree_map(
            lambda old, upd: jnp.where(active, upd, old), grid, new)

    def insert_both(grids: Grid2D, rd: RangeData, active: jnp.ndarray) -> Grid2D:
        return jax.vmap(insert_one, in_axes=(0, None, 0))(grids, rd, active)

    return insert_both


def insert_body_key(options: SubmapsOptions2D, tpu: TpuOptions2D) -> tuple:
    """Hashable key identifying the batched-insert body for a config (shared
    jit/fusion cache across builders and the fused scan program)."""
    if options.grid_type == "TSDF":
        t = options.tsdf_range_data_inserter
        return ("TSDF", (t.update_weight_range_exponent,
                         t.update_weight_angle_scan_normal_to_ray_kernel_bandwidth,
                         t.update_weight_distance_cell_to_hit_kernel_bandwidth,
                         t.project_sdf_distance_to_scan_normal))
    ins = options.probability_grid_range_data_inserter
    return ("PROBABILITY_GRID", (ins.hit_probability, ins.miss_probability,
                                 ins.insert_free_space, tpu.ray_samples))


from functools import lru_cache


@lru_cache(maxsize=None)
def insert_body_cached(grid_type: str, params: tuple):
    """Unjitted batched (2-slot) insert body for `insert_body_key` keys."""
    if grid_type == "TSDF":
        from cartographer_tpu.ops.tsdf_2d import insert_range_data_tsdf

        (range_exp, angle_bw, dist_bw, project_normal) = params

        def insert_one(grid, rd, active):
            new = insert_range_data_tsdf(
                grid, rd,
                update_weight_range_exponent=range_exp,
                angle_kernel_bandwidth=angle_bw,
                distance_kernel_bandwidth=dist_bw,
                project_to_normal=project_normal)
            return jax.tree_util.tree_map(
                lambda old, upd: jnp.where(active, upd, old), grid, new)

        return jax.vmap(insert_one, in_axes=(0, None, 0))
    return _make_insert_body(*params)


class ActiveSubmaps2D:
    """The reference's ActiveSubmaps2D with both grids device-resident.

    Slot 0 is the matching (older) submap, slot 1 the initializing one.
    """

    def __init__(self, options: SubmapsOptions2D, tpu: TpuOptions2D):
        self._options = options
        self._tpu = tpu
        self.submaps: List[Submap2D] = []
        self._grids: Optional[Grid2D] = None  # batched (2, S, S)
        self._insert_body = insert_body_cached(*insert_body_key(options, tpu))
        self._insert_fn = jax.jit(self._insert_body, donate_argnums=(0,))

    def _blank_grid(self, center_xy: np.ndarray):
        if self._options.grid_type == "TSDF":
            from cartographer_tpu.ops.tsdf_2d import TsdfGrid2D

            tsdf = self._options.tsdf_range_data_inserter
            return TsdfGrid2D.create(
                self._tpu.submap_grid_size, self._options.resolution,
                jnp.asarray(center_xy, jnp.float32),
                truncation_distance=tsdf.truncation_distance,
                max_weight=tsdf.maximum_weight)
        return Grid2D.create(self._tpu.submap_grid_size, self._options.resolution,
                             jnp.asarray(center_xy, jnp.float32))

    @property
    def matching_grid(self) -> Optional[Grid2D]:
        if self._grids is None:
            return None
        return jax.tree_util.tree_map(lambda x: x[0], self._grids)

    def _set_slot(self, slot: int, grid: Grid2D) -> None:
        if self._grids is None:
            stacked = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), grid)
            self._grids = stacked
        else:
            self._grids = jax.tree_util.tree_map(
                lambda all_, one: all_.at[slot].set(one), self._grids, grid)

    def _grid_at(self, slot: int) -> Grid2D:
        return jax.tree_util.tree_map(lambda x: x[slot], self._grids)

    def prepare(self, origin_xy: np.ndarray) -> jnp.ndarray:
        """Window management BEFORE an insertion: rotate/create submaps per
        the counters (submap_2d.cc InsertRangeData's AddSubmap branch) and
        return the active-slot mask. Split from the insertion itself so the
        fused per-scan device program can perform the (conditional) insert
        with zero extra host round-trips."""
        if not self.submaps or (
                self.submaps[-1].num_range_data == self._options.num_range_data):
            self._add_submap(origin_xy)
        # Host numpy: jit transfers it with the step's other args — an
        # eager per-scan device_put here costs a dispatch on the hot path.
        return np.asarray([True, len(self.submaps) > 1], dtype=bool)

    def commit(self, inserted: bool) -> List[Submap2D]:
        """Counter bookkeeping AFTER a (possibly skipped) fused insertion;
        returns newly finished submaps. The caller has already stored the
        program's returned grids via `set_grids`."""
        finished: List[Submap2D] = []
        if not inserted:
            return finished
        for submap in self.submaps:
            submap.num_range_data += 1
        # Finish (snapshot) the matching submap at 2N scans; it stays in the
        # window for matching until the next rotation evicts it
        # (submap_2d.cc InsertRangeData).
        front = self.submaps[0]
        if (not front.insertion_finished
                and front.num_range_data == 2 * self._options.num_range_data):
            front.insertion_finished = True
            front.grid = self._grid_at(0)
            finished.append(front)
        return finished

    @property
    def grids(self):
        return self._grids

    def set_grids(self, grids) -> None:
        self._grids = grids

    @property
    def insert_fn(self):
        return self._insert_fn

    def insert_range_data(self, range_data_2d: RangeData,
                          origin_xy: np.ndarray) -> List[Submap2D]:
        """Insert a gravity-aligned local-frame scan; returns finished submaps.

        Mirrors ActiveSubmaps2D::InsertRangeData (submap_2d.cc): rotate the
        window when the newest submap has seen num_range_data scans; finish
        the oldest at 2 * num_range_data.
        """
        active = self.prepare(origin_xy)
        self._grids = self._insert_fn(self._grids, range_data_2d, active)
        return self.commit(True)

    def _add_submap(self, origin_xy: np.ndarray) -> None:
        """Start a new submap at `origin_xy`; evicts the (finished) oldest."""
        if len(self.submaps) == 2:
            self.submaps.pop(0)
            # Shift slot 1 -> slot 0.
            self._set_slot(0, self._grid_at(1))

        new = Submap2D(
            local_pose_translation=np.array([origin_xy[0], origin_xy[1], 0.0]),
            local_pose_rotation=np.array([1.0, 0.0, 0.0, 0.0]),
        )
        self.submaps.append(new)
        slot = len(self.submaps) - 1
        self._set_slot(slot, self._blank_grid(np.asarray(origin_xy)))
        if len(self.submaps) == 1:
            # Keep slot 1 blank until a second submap starts.
            self._set_slot(1, self._blank_grid(np.asarray(origin_xy)))

    def finish_all(self) -> List[Submap2D]:
        """Snapshot every active submap (used on trajectory finish)."""
        finished = []
        for i, submap in enumerate(self.submaps):
            if not submap.insertion_finished:
                submap.insertion_finished = True
                submap.grid = self._grid_at(i)
                finished.append(submap)
        return finished
