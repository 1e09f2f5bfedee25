"""Voxel downsampling as sort-based device kernels [KERNEL].

Reference: sensor/internal/voxel_filter.cc — RandomizedVoxelFilter keeps one
reservoir-sampled point per voxel; AdaptiveVoxelFilter binary-searches the
voxel edge length until >= min_num_points survive; the fork's VoxelFilterEdge
keeps points in sparsely-populated voxels (anisotropic neighborhoods).

TPU design: instead of a hash map (pointer-chasing, dynamic size), points are
keyed by packed voxel indices and lexicographically sorted by (key, random
priority); the last point of each equal-key run is the kept representative —
an O(N log N) fully-vectorized equivalent of per-voxel reservoir sampling.
Outputs are masks over the padded cloud, so shapes stay static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cartographer_tpu.sensor.point_cloud import PointCloud

_ADAPTIVE_COARSE_STEPS = 7  # max_length/2^7 < 1e-2*max_length stopping rule
_ADAPTIVE_BISECT_STEPS = 5  # until (high-low)/low <= 10%


def _run_boundaries(sorted_keys) -> jnp.ndarray:
    """True where sorted_keys[i] != sorted_keys[i+1] in any component."""
    diff = None
    for k in sorted_keys:
        d = k[:-1] != k[1:]
        diff = d if diff is None else (diff | d)
    return diff


_PACK_BIAS = 1 << 15  # per-axis voxel indices packed as biased 16-bit fields


def _packed_voxel_keys(points: jnp.ndarray, mask: jnp.ndarray, resolution):
    """Voxel key packed into 1 (2D) or 2 (3D) uint32 sort keys.

    Sorting one machine word is ~3x cheaper on TPU than a 3-operand lexsort
    and the adaptive filter sorts ~14 times per scan, so this is the hot
    path. Indices are clipped to +-2^15 cells — valid while
    max_range / resolution < 32767 (always true for the reference's configs:
    the adaptive filter caps range at max_range and halves the edge at most
    7 times); callers with finer resolutions must check this themselves.
    Masked points get the max key so they sort last and never merge with
    real voxels; valid indices are clipped to _PACK_BIAS-2 so no packed key
    of a valid point can equal the 0xFFFFFFFF sentinel.
    """
    if isinstance(resolution, (int, float)):
        assert resolution > 0, "voxel resolution must be positive"
    idx = jnp.clip(
        jnp.floor(points / resolution + 0.5).astype(jnp.int32),
        -_PACK_BIAS, _PACK_BIAS - 2,
    ) + _PACK_BIAS  # non-negative 16-bit fields, max 0xFFFE per field
    idx = idx.astype(jnp.uint32)
    d = points.shape[-1]
    sentinel = jnp.uint32(0xFFFFFFFF)
    kxy = (idx[..., 0] << 16) | idx[..., 1]
    if d == 2:
        return (jnp.where(mask, kxy, sentinel),)
    return (jnp.where(mask, kxy, sentinel),
            jnp.where(mask, idx[..., 2], sentinel))


def voxel_filter_mask(points: jnp.ndarray, mask: jnp.ndarray, resolution,
                      seed: jnp.ndarray) -> jnp.ndarray:
    """Boolean keep-mask selecting one random point per occupied voxel.

    Reservoir semantics via shuffle-then-stable-sort: a seed-derived random
    permutation of the points, a stable sort by packed voxel key, and taking
    the last point of each equal-key run picks a uniformly random
    representative per voxel (voxel_filter.cc RandomizedVoxelFilter).
    """
    n = points.shape[0]
    perm = jax.random.permutation(
        jax.random.PRNGKey(0) if seed is None else seed, n)
    keys = _packed_voxel_keys(points[perm], mask[perm], resolution)
    sorted_ops = jax.lax.sort(keys + (perm,), num_keys=len(keys),
                              is_stable=True)
    sorted_keys, sorted_ids = sorted_ops[:-1], sorted_ops[-1]
    # Last element of each run of equal keys is the reservoir pick.
    is_last = jnp.concatenate([_run_boundaries(sorted_keys), jnp.array([True])])
    keep = jnp.zeros(n, bool).at[sorted_ids].set(is_last)
    return keep & mask


def voxel_filter(cloud: PointCloud, resolution: float,
                 seed: jnp.ndarray | None = None) -> PointCloud:
    """One point per voxel of edge `resolution` (sensor::VoxelFilter)."""
    if seed is None:
        seed = jax.random.PRNGKey(0)
    return cloud.filter_mask(voxel_filter_mask(cloud.points, cloud.mask, resolution, seed))


def adaptive_voxel_filter(cloud: PointCloud, max_length: float,
                          min_num_points: int, max_range: float,
                          seed: jnp.ndarray | None = None) -> PointCloud:
    """sensor::AdaptiveVoxelFilter (voxel_filter.cc:38-75), jit-compatible.

    1. Drop points beyond max_range (of the sensor origin == cloud frame origin).
    2. If <= min_num_points remain, keep all.
    3. Else halve the edge length from max_length until enough points survive
       (bounded steps), then bisect to within 10%.
    """
    if seed is None:
        seed = jax.random.PRNGKey(0)
    in_range = jnp.linalg.norm(cloud.points, axis=-1) <= max_range
    base_mask = cloud.mask & in_range
    num_base = jnp.sum(base_mask)

    def count_at(length):
        return jnp.sum(voxel_filter_mask(cloud.points, base_mask, length, seed))

    # Coarse search: first halving step with enough surviving points.
    lengths = max_length / (2.0 ** jnp.arange(_ADAPTIVE_COARSE_STEPS, dtype=jnp.float32))
    counts = jax.vmap(count_at)(lengths)
    ok = counts >= min_num_points
    first_ok = jnp.argmax(ok)  # 0 if none ok (handled below)
    any_ok = jnp.any(ok)
    low = jnp.where(any_ok, lengths[first_ok], lengths[-1])
    high = jnp.where(first_ok > 0, lengths[jnp.maximum(first_ok - 1, 0)], lengths[0])

    def bisect(carry, _):
        low, high = carry
        mid = 0.5 * (low + high)
        enough = count_at(mid) >= min_num_points
        return (jnp.where(enough, mid, low), jnp.where(enough, high, mid)), None

    (low, high), _ = jax.lax.scan(bisect, (low, high), None, length=_ADAPTIVE_BISECT_STEPS)
    chosen = jnp.where(first_ok == 0, max_length, low)
    filtered = voxel_filter_mask(cloud.points, base_mask, chosen, seed)
    keep = jnp.where(num_base <= min_num_points, base_mask, filtered & jnp.where(any_ok, True, True))
    # If no length produced enough points, fall back to the finest filtering
    # (reference returns the last result of the halving loop).
    keep = jnp.where(
        (num_base > min_num_points) & ~any_ok,
        voxel_filter_mask(cloud.points, base_mask, lengths[-1], seed),
        keep,
    )
    return cloud.filter_mask(keep)


def voxel_filter_edge(cloud: PointCloud, resolution: float,
                      voxel_edge_ratio: float = 0.5) -> PointCloud:
    """Fork's edge-preserving filter (voxel_filter.cc EdgeVoxelFilterIndices):
    keeps points whose voxel population < max_population * voxel_edge_ratio,
    i.e. points on sparsely-sampled structure (edges) survive.
    """
    keys = _packed_voxel_keys(cloud.points, cloud.mask, resolution)
    order = jnp.lexsort(keys[::-1])
    sorted_keys = tuple(k[order] for k in keys)
    run_start = jnp.concatenate([jnp.array([True]), _run_boundaries(sorted_keys)])
    run_id = jnp.cumsum(run_start) - 1
    counts = jnp.zeros(cloud.capacity, jnp.int32).at[run_id].add(1)
    per_point_count_sorted = counts[run_id]
    per_point_count = jnp.zeros(cloud.capacity, jnp.int32).at[order].set(per_point_count_sorted)
    max_count = jnp.max(jnp.where(cloud.mask, per_point_count, 0))
    threshold = (max_count.astype(jnp.float32) * voxel_edge_ratio).astype(jnp.int32)
    return cloud.filter_mask(per_point_count < threshold)
