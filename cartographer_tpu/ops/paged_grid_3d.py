"""Paged (sparse) 3D occupancy grid — the HybridGrid replacement at range.

Reference: mapping/3d/hybrid_grid.h:40-52 — an unbounded 3-level sparse
voxel structure (DynamicGrid<NestedGrid<FlatGrid>>). Pointer-chasing trees
don't map to XLA's static shapes, so the TPU design is a *page pool*:

  - a fixed pool of P dense pages of B^3 voxels (static shapes; XLA-native),
  - a dense int32 page table over an extent of `blocks`^3 page slots
    (64^3 blocks x 32-voxel pages at 10 cm = a 204.8 m cube of addressable
    space for 1 MB of table),
  - host-assisted allocation: scans touch a handful of blocks; the host
    assigns pool slots for new blocks (a dict lookup per block, off the hot
    path) and the device scatters hits/misses into the pool,
  - matching stays on the existing dense kernels via `crop_dense`: one
    device gather assembles the pages overlapping a query window into a
    dense Grid3D (matching is local — the window is the scan extent).

Memory: pool P=512 x 32^3 f32 = 67 MB addresses the same space a dense
2048^3 grid (34 GB) would — the sparse 3-level semantics at static shape.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.ops.probability import (
    clamp_log_odds,
    log_odds_to_probability,
    probability_to_log_odds,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PagedGrid3D:
    """Page-pool voxel grid. Block (bx, by, bz) covers world cells
    [b * B, (b+1) * B); page_table holds the pool slot or -1."""

    pages: jnp.ndarray  # (P, B, B, B) f32 log-odds
    known: jnp.ndarray  # (P, B, B, B) bool
    page_table: jnp.ndarray  # (NB, NB, NB) int32, -1 = unallocated
    origin: jnp.ndarray  # (3,) world position of cell (0,0,0) corner
    resolution: float = dataclasses.field(metadata=dict(static=True))
    page_size: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def create(resolution: float, center, page_size: int = 32,
               max_pages: int = 512, num_blocks: int = 64) -> "PagedGrid3D":
        extent = num_blocks * page_size * resolution
        origin = jnp.asarray(center, jnp.float32) - 0.5 * extent
        return PagedGrid3D(
            pages=jnp.zeros((max_pages, page_size, page_size, page_size),
                            jnp.float32),
            known=jnp.zeros((max_pages, page_size, page_size, page_size),
                            bool),
            page_table=jnp.full((num_blocks,) * 3, -1, jnp.int32),
            origin=origin, resolution=resolution, page_size=page_size)

    @property
    def max_pages(self) -> int:
        return self.pages.shape[0]

    @property
    def num_blocks(self) -> int:
        return self.page_table.shape[0]

    def world_to_cell(self, points: jnp.ndarray) -> jnp.ndarray:
        # Note: points exactly on a cell boundary may voxelize differently
        # between compilation variants of this expression (divide vs
        # reciprocal-multiply rounding) — same caveat as the reference's
        # float-derived cell indices. Real sensor data is almost never
        # boundary-exact.
        return jnp.floor((points - self.origin) / self.resolution).astype(
            jnp.int32)

    def probability_at(self, points: jnp.ndarray,
                       unknown: float = 0.5) -> jnp.ndarray:
        """Per-point cell probability (unknown cells -> `unknown`)."""
        B = self.page_size
        cells = self.world_to_cell(points)
        nb = self.num_blocks
        block = jnp.clip(cells // B, 0, nb - 1)
        off = cells - block * B  # in [0, B) when in bounds
        inb = jnp.all((cells >= 0) & (cells < nb * B), axis=-1)
        page = self.page_table[block[..., 0], block[..., 1], block[..., 2]]
        page_ok = (page >= 0) & inb
        p0 = jnp.maximum(page, 0)
        lo = self.pages[p0, off[..., 0], off[..., 1], off[..., 2]]
        kn = self.known[p0, off[..., 0], off[..., 1], off[..., 2]]
        return jnp.where(page_ok & kn, log_odds_to_probability(lo), unknown)


def _allocate_blocks(slots: Dict[Tuple[int, int, int], int],
                     page_table: np.ndarray, block_keys: np.ndarray,
                     max_pages: int):
    """Assign pool slots to new blocks in `slots` (mutated) and update the
    HOST page-table mirror IN PLACE; returns the (n, 3) int64 indices and
    (n,) int32 slot values of the new entries (or None if unchanged).
    Raises when the pool is exhausted. Shared by the occupancy and
    intensity page pools. The caller applies the same entries to the
    DEVICE table as a sparse .at[].set — copying + re-uploading the whole
    table per insert measured ~1 ms host copy plus a 1 MB transfer per
    scan per pool."""
    new = [tuple(k) for k in block_keys if tuple(k) not in slots]
    if not new:
        return None
    if len(slots) + len(new) > max_pages:
        raise MemoryError(f"page pool exhausted ({max_pages} pages)")
    idx = np.asarray(new, np.int64)
    vals = np.arange(len(slots), len(slots) + len(new), dtype=np.int32)
    for key, s in zip(new, vals):
        slots[key] = int(s)
    page_table[idx[:, 0], idx[:, 1], idx[:, 2]] = vals
    return idx, vals


class PagedSubmapGrid3D:
    """Host wrapper owning the allocation state of one PagedGrid3D.

    The device pytree is immutable/functional; block allocation (dict of
    block key -> pool slot) is sequential host work, exactly the part the
    reference does with its DynamicGrid pointer array."""

    def __init__(self, resolution: float, center, page_size: int = 32,
                 max_pages: int = 512, num_blocks: int = 64):
        self.grid = PagedGrid3D.create(resolution, center, page_size,
                                       max_pages, num_blocks)
        self._slots: Dict[Tuple[int, int, int], int] = {}
        # Host mirrors of the allocation state: the insert hot path must
        # never block on a device fetch (origin/page_table live on device).
        extent = num_blocks * page_size * resolution
        self._origin_host = (np.asarray(center, np.float32)
                             - np.float32(0.5 * extent))
        self._table_host = np.full((num_blocks,) * 3, -1, np.int32)

    @property
    def num_allocated(self) -> int:
        return len(self._slots)

    def _allocate(self, block_keys: np.ndarray) -> bool:
        upd = _allocate_blocks(self._slots, self._table_host,
                               block_keys, self.grid.max_pages)
        if upd is None:
            return False
        idx, vals = upd
        self.grid = dataclasses.replace(
            self.grid,
            page_table=self.grid.page_table.at[
                jnp.asarray(idx[:, 0]), jnp.asarray(idx[:, 1]),
                jnp.asarray(idx[:, 2])].set(jnp.asarray(vals)))
        return True

    def insert_range_data(self, origin, returns, mask,
                          hit_probability: float = 0.55,
                          miss_probability: float = 0.49,
                          num_free_space_voxels: int = 2) -> None:
        """RangeDataInserter3D::Insert against the page pool.

        Host: derive the touched block set (hits + the trailing free-space
        samples, all within num_free_space_voxels cells of a hit) and
        allocate slots. Device: scatter the updates into the pool.
        """
        B = self.grid.page_size
        nb = self.grid.num_blocks
        res = self.grid.resolution
        pts = np.asarray(returns)
        m = np.asarray(mask)
        o = self._origin_host
        cells = np.floor((pts[m] - o) / res).astype(np.int64)
        ocell = np.floor((np.asarray(origin) - o) / res).astype(np.int64)
        # Free-space samples stay within num_free_space_voxels cells of the
        # hit along the ray; their blocks are covered by dilating the hit
        # block set by one block when a hit sits near a block edge.
        f = num_free_space_voxels
        blocks = []
        for c in (cells - f, cells + f, cells):
            inb = np.all((c >= 0) & (c < nb * B), axis=-1)
            blocks.append(c[inb] // B)
        bb = np.concatenate(blocks) if blocks else np.zeros((0, 3), np.int64)
        if len(bb):
            # One flattened 1D unique instead of three axis=0 uniques + a
            # tuple set (the per-scan host hot path).
            flat = (bb[:, 0] * nb + bb[:, 1]) * nb + bb[:, 2]
            uniq = np.unique(flat)
            keys = np.stack([uniq // (nb * nb), (uniq // nb) % nb,
                             uniq % nb], -1)
            self._allocate(keys)
        self.grid = _insert_paged(
            self.grid, jnp.asarray(np.asarray(origin, np.float32)),
            jnp.asarray(pts.astype(np.float32)), jnp.asarray(m),
            hit_probability, miss_probability, num_free_space_voxels)

    def crop_dense(self, center, size: int):
        """Assemble the pages overlapping a size^3 window into a dense
        Grid3D (for the dense scan-matching kernels)."""
        return crop_dense(self.grid, jnp.asarray(center, jnp.float32), size)

    def compact(self) -> None:
        """Shrink the pool to the allocated pages (padded to a power of two
        so crop_dense compiles per size bucket, not per submap) and move it
        to host memory — a finished submap keeps only its content
        (~allocated_pages * page_size^3 floats) instead of the full pool."""
        import math

        n = max(1, 1 << math.ceil(math.log2(max(self.num_allocated, 1))))
        n = min(n, self.grid.max_pages)
        self.grid = dataclasses.replace(
            self.grid,
            pages=np.asarray(self.grid.pages[:n]),
            known=np.asarray(self.grid.known[:n]),
            page_table=np.asarray(self.grid.page_table),
            origin=np.asarray(self.grid.origin))

    def known_center(self) -> np.ndarray:
        """World center of the allocated (touched) blocks — the content
        centroid, used to place content-centered dense crops at finish."""
        if not self._slots:
            return self._origin_host + np.float32(
                0.5 * self.grid.num_blocks * self.grid.page_size
                * self.grid.resolution)
        keys = np.asarray(list(self._slots.keys()), np.float64)
        mid = (keys.mean(axis=0) + 0.5) * self.grid.page_size
        return self._origin_host + mid * self.grid.resolution


from functools import partial


@partial(jax.jit, static_argnames=("num_free_space_voxels",))
def _insert_paged(grid: PagedGrid3D, origin, returns, mask,
                  hit_probability, miss_probability,
                  num_free_space_voxels: int) -> PagedGrid3D:
    B = grid.page_size
    nb = grid.num_blocks

    def pool_index(cells, valid):
        """(N, 3) world cells -> flat pool index, or OOB sentinel."""
        inb = valid & jnp.all((cells >= 0) & (cells < nb * B), axis=-1)
        block = jnp.clip(cells // B, 0, nb - 1)
        off = jnp.clip(cells - block * B, 0, B - 1)
        page = grid.page_table[block[..., 0], block[..., 1], block[..., 2]]
        ok = inb & (page >= 0)
        lin = ((jnp.maximum(page, 0) * B + off[..., 0]) * B
               + off[..., 1]) * B + off[..., 2]
        flat = grid.max_pages * B**3
        return jnp.where(ok, lin, flat)

    flat = grid.max_pages * B**3
    hit_cells = grid.world_to_cell(returns)
    hit_lin = pool_index(hit_cells, mask)
    hit_mask = jnp.zeros(flat + 1, bool).at[hit_lin].set(True)[:flat]

    if num_free_space_voxels > 0:
        origin_cell = grid.world_to_cell(origin)
        delta = hit_cells - origin_cell[None, :]
        num_samples = jnp.max(jnp.abs(delta), axis=-1)
        ks = jnp.arange(1, num_free_space_voxels + 1)
        positions = jnp.maximum(num_samples[:, None] - ks[None, :], 0)
        miss_cells = origin_cell[None, None, :] + (
            delta[:, None, :] * positions[:, :, None]
        ) // jnp.maximum(num_samples[:, None, None], 1)
        miss_valid = jnp.broadcast_to(
            (mask & (num_samples > 0))[:, None], positions.shape)
        miss_lin = pool_index(miss_cells.reshape(-1, 3),
                              miss_valid.reshape(-1))
        miss_mask = jnp.zeros(flat + 1, bool).at[miss_lin].set(True)[:flat]
        miss_mask = miss_mask & ~hit_mask
    else:
        miss_mask = jnp.zeros(flat, bool)

    hit_lo = probability_to_log_odds(jnp.float32(hit_probability))
    miss_lo = probability_to_log_odds(jnp.float32(miss_probability))
    shape = grid.pages.shape
    log_odds = clamp_log_odds(
        grid.pages.reshape(-1)
        + jnp.where(hit_mask, hit_lo, 0.0)
        + jnp.where(miss_mask, miss_lo, 0.0)).reshape(shape)
    known = grid.known | (hit_mask | miss_mask).reshape(shape)
    return dataclasses.replace(grid, pages=log_odds, known=known)


def _crop_pools(page_table, pools, world_to_cell, origin, resolution,
                page_size: int, center, size: int):
    """Shared page-gather crop: slice each (P, B, B, B) pool in `pools` to a
    dense size^3 window centered at `center`. Returns (denses, window origin)."""
    B = page_size
    nb = page_table.shape[0]
    nblk = size // B + 2  # block-aligned cover of any size^3 window
    center_cell = world_to_cell(center)
    window_start = center_cell - size // 2  # first cell of the crop
    start_block = jnp.floor_divide(window_start, B)
    bidx = start_block[None, :] + jnp.stack(
        jnp.meshgrid(jnp.arange(nblk), jnp.arange(nblk), jnp.arange(nblk),
                     indexing="ij"), -1).reshape(-1, 3)
    okb = jnp.all((bidx >= 0) & (bidx < nb), axis=-1)
    bclip = jnp.clip(bidx, 0, nb - 1)
    page = page_table[bclip[:, 0], bclip[:, 1], bclip[:, 2]]
    ok = okb & (page >= 0)

    def assemble(blocks):
        a = blocks.reshape(nblk, nblk, nblk, B, B, B)
        return a.transpose(0, 3, 1, 4, 2, 5).reshape(nblk * B, nblk * B,
                                                     nblk * B)

    off = window_start - start_block * B  # in [0, B)
    denses = []
    for pool in pools:
        zero = jnp.zeros((), pool.dtype)
        gathered = jnp.where(ok[:, None, None, None],
                             pool[jnp.maximum(page, 0)], zero)
        denses.append(jax.lax.dynamic_slice(assemble(gathered), off,
                                            (size, size, size)))
    window_origin = origin + window_start.astype(jnp.float32) * resolution
    return denses, window_origin


@partial(jax.jit, static_argnames=("size",))
def crop_dense(grid: PagedGrid3D, center: jnp.ndarray, size: int):
    """Dense (size^3) Grid3D of the window centered at `center`, assembled
    by gathering whole pages (one take over the pool; block-aligned)."""
    from cartographer_tpu.ops.grid_3d import Grid3D

    (dense, dense_known), origin = _crop_pools(
        grid.page_table, (grid.pages, grid.known), grid.world_to_cell,
        grid.origin, grid.resolution, grid.page_size, center, size)
    return Grid3D(log_odds=dense, known=dense_known, origin=origin,
                  resolution=grid.resolution)


# --------------------------------------------------------------- intensity
# Reference: IntensityHybridGrid (mapping/3d/hybrid_grid.h:547-576) — a
# running-average intensity per voxel kept ONLY for the high-resolution grid
# of active submaps and consumed by the frontend matcher's intensity
# residual (local_trajectory_builder_3d.cc:489-500). The reference drops it
# when a submap leaves the active window (submap_3d.cc:400-404
# ForgetIntensityHybridGrid); the page pool makes keeping the compacted
# content cheap, so finished submaps keep (and serialize) theirs.


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PagedIntensityGrid3D:
    """Page-pool running-average intensity grid (sums/counts pools share one
    page table)."""

    sums: jnp.ndarray  # (P, B, B, B) f32
    counts: jnp.ndarray  # (P, B, B, B) f32
    page_table: jnp.ndarray  # (NB, NB, NB) int32, -1 = unallocated
    origin: jnp.ndarray  # (3,)
    resolution: float = dataclasses.field(metadata=dict(static=True))
    page_size: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def create(resolution: float, center, page_size: int = 32,
               max_pages: int = 512,
               num_blocks: int = 64) -> "PagedIntensityGrid3D":
        extent = num_blocks * page_size * resolution
        origin = jnp.asarray(center, jnp.float32) - 0.5 * extent
        shape = (max_pages, page_size, page_size, page_size)
        return PagedIntensityGrid3D(
            sums=jnp.zeros(shape, jnp.float32),
            counts=jnp.zeros(shape, jnp.float32),
            page_table=jnp.full((num_blocks,) * 3, -1, jnp.int32),
            origin=origin, resolution=resolution, page_size=page_size)

    @property
    def max_pages(self) -> int:
        return self.sums.shape[0]

    @property
    def num_blocks(self) -> int:
        return self.page_table.shape[0]

    def world_to_cell(self, points: jnp.ndarray) -> jnp.ndarray:
        return jnp.floor((points - self.origin) / self.resolution).astype(
            jnp.int32)


@jax.jit
def _insert_intensity_paged(grid: PagedIntensityGrid3D, returns, intensities,
                            valid) -> PagedIntensityGrid3D:
    """Scatter-add intensity sums/counts of `valid` hits into the pool
    (IntensityHybridGrid::AddIntensity, hybrid_grid.h:560-566)."""
    B = grid.page_size
    nb = grid.num_blocks
    cells = grid.world_to_cell(returns)
    inb = valid & jnp.all((cells >= 0) & (cells < nb * B), axis=-1)
    block = jnp.clip(cells // B, 0, nb - 1)
    off = jnp.clip(cells - block * B, 0, B - 1)
    page = grid.page_table[block[..., 0], block[..., 1], block[..., 2]]
    ok = inb & (page >= 0)
    lin = ((jnp.maximum(page, 0) * B + off[..., 0]) * B
           + off[..., 1]) * B + off[..., 2]
    flat = grid.max_pages * B**3
    lin = jnp.where(ok, lin, flat)
    shape = grid.sums.shape
    sums = grid.sums.reshape(-1).at[jnp.minimum(lin, flat - 1)].add(
        jnp.where(ok, intensities, 0.0)).reshape(shape)
    counts = grid.counts.reshape(-1).at[jnp.minimum(lin, flat - 1)].add(
        jnp.where(ok, 1.0, 0.0)).reshape(shape)
    return dataclasses.replace(grid, sums=sums, counts=counts)


@partial(jax.jit, static_argnames=("size",))
def crop_dense_intensity(grid: PagedIntensityGrid3D, center: jnp.ndarray,
                         size: int):
    """Dense (size^3) IntensityGrid3D window centered at `center`."""
    from cartographer_tpu.ops.grid_3d import IntensityGrid3D

    (sums, counts), origin = _crop_pools(
        grid.page_table, (grid.sums, grid.counts), grid.world_to_cell,
        grid.origin, grid.resolution, grid.page_size, center, size)
    return IntensityGrid3D(sums=sums, counts=counts, origin=origin,
                           resolution=grid.resolution)


class PagedIntensitySubmapGrid3D:
    """Host wrapper owning the allocation state of one PagedIntensityGrid3D
    (the intensity analog of PagedSubmapGrid3D)."""

    def __init__(self, resolution: float, center, page_size: int = 32,
                 max_pages: int = 512, num_blocks: int = 64):
        self.grid = PagedIntensityGrid3D.create(resolution, center, page_size,
                                                max_pages, num_blocks)
        self._slots: Dict[Tuple[int, int, int], int] = {}
        extent = num_blocks * page_size * resolution
        self._origin_host = (np.asarray(center, np.float32)
                             - np.float32(0.5 * extent))
        self._table_host = np.full((num_blocks,) * 3, -1, np.int32)

    @property
    def num_allocated(self) -> int:
        return len(self._slots)

    def insert(self, returns, intensities, mask,
               intensity_threshold: float) -> None:
        """InsertIntensitiesIntoGrid (range_data_inserter_3d.cc:76-88): only
        points with intensity <= threshold contribute. Host allocates the
        touched blocks; device scatters the sums/counts."""
        B = self.grid.page_size
        nb = self.grid.num_blocks
        pts = np.asarray(returns)
        m = np.asarray(mask) & (np.asarray(intensities)
                                <= intensity_threshold)
        if not m.any():
            return
        o = self._origin_host
        cells = np.floor((pts[m] - o) / self.grid.resolution).astype(np.int64)
        inb = np.all((cells >= 0) & (cells < nb * B), axis=-1)
        keys = np.unique(cells[inb] // B, axis=0)
        if len(keys):
            upd = _allocate_blocks(self._slots, self._table_host,
                                   keys, self.grid.max_pages)
            if upd is not None:
                idx, vals = upd
                self.grid = dataclasses.replace(
                    self.grid,
                    page_table=self.grid.page_table.at[
                        jnp.asarray(idx[:, 0]), jnp.asarray(idx[:, 1]),
                        jnp.asarray(idx[:, 2])].set(jnp.asarray(vals)))
        self.grid = _insert_intensity_paged(
            self.grid, jnp.asarray(pts.astype(np.float32)),
            jnp.asarray(np.asarray(intensities, np.float32)), jnp.asarray(m))

    def crop_dense(self, center, size: int):
        return crop_dense_intensity(self.grid,
                                    jnp.asarray(center, jnp.float32), size)

    def compact(self) -> None:
        """Shrink the pools to the allocated pages (power-of-two padded so
        crops compile per size bucket) and move them to host memory."""
        import math

        n = max(1, 1 << math.ceil(math.log2(max(self.num_allocated, 1))))
        n = min(n, self.grid.max_pages)
        self.grid = dataclasses.replace(
            self.grid,
            sums=np.asarray(self.grid.sums[:n]),
            counts=np.asarray(self.grid.counts[:n]),
            page_table=np.asarray(self.grid.page_table),
            origin=np.asarray(self.grid.origin))
