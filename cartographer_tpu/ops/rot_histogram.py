"""Rotational scan histograms for 3D loop-closure yaw pruning [KERNEL].

Reference: mapping/internal/3d/scan_matching/rotational_scan_matcher.cc —
per-scan histograms of inter-point angles, built per 0.2 m z-slice with
points sorted by angle around the slice centroid; matching rotates the scan
histogram by candidate yaws and takes the cosine similarity against the
submap histogram.

TPU design: slice assignment + centroid computation are segment reductions;
the reference's sequential anchor-walk over each sorted slice becomes one
lax.scan over the globally (slice, angle)-sorted cloud with anchor resets at
slice boundaries; histogram accumulation is a scatter-add. Matching over all
candidate yaws is a single vectorized circular-shift + dot product.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MIN_DISTANCE = 0.2
_MAX_DISTANCE = 0.9
_SLICE_HEIGHT = 0.2
_MAX_SLICES = 128


def compute_rotational_histogram(
    points: jnp.ndarray,  # (N, 3)
    mask: jnp.ndarray,  # (N,)
    histogram_size: int = 120,
) -> jnp.ndarray:
    """RotationalScanMatcher::ComputeHistogram equivalent; returns (bins,)."""
    n = points.shape[0]
    z = points[..., 2]
    zmin = jnp.min(jnp.where(mask, z, jnp.inf))
    slice_idx = jnp.clip(
        jnp.floor((z - zmin) / _SLICE_HEIGHT).astype(jnp.int32), 0, _MAX_SLICES - 1)
    slice_idx = jnp.where(mask, slice_idx, _MAX_SLICES)  # invalid -> sentinel

    # Per-slice centroids via segment sums.
    ones = jnp.where(mask, 1.0, 0.0)
    sums = jnp.zeros((_MAX_SLICES + 1, 3)).at[slice_idx].add(
        jnp.where(mask[:, None], points, 0.0))
    counts = jnp.zeros(_MAX_SLICES + 1).at[slice_idx].add(ones)
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]

    delta_c = points[:, 0:2] - centroids[slice_idx, 0:2]
    angle_c = jnp.arctan2(delta_c[:, 1], delta_c[:, 0])
    # Points too close to the centroid are dropped before sorting (SortSlice).
    keep = mask & (jnp.linalg.norm(delta_c, axis=-1) >= _MIN_DISTANCE)
    sort_slice = jnp.where(keep, slice_idx, _MAX_SLICES)

    order = jnp.lexsort((angle_c, sort_slice))
    sp = points[order]
    s_slice = sort_slice[order]
    s_centroid = centroids[jnp.minimum(s_slice, _MAX_SLICES)]

    new_slice = jnp.concatenate(
        [jnp.array([True]), s_slice[1:] != s_slice[:-1]])

    def step(carry, inp):
        last = carry
        p, centroid, is_new, valid = inp
        last = jnp.where(is_new, p, last)  # anchor resets at slice start
        delta = p[0:2] - last[0:2]
        direction = p[0:2] - centroid[0:2]
        distance = jnp.linalg.norm(delta)
        dirn = jnp.linalg.norm(direction)
        emit = (valid & ~is_new & (distance >= _MIN_DISTANCE)
                & (dirn >= _MIN_DISTANCE) & (distance <= _MAX_DISTANCE))
        # Anchor advances only when the gap exceeds kMaxDistance
        # (rotational_scan_matcher.cc:71-84).
        advance = valid & (distance > _MAX_DISTANCE) & (dirn >= _MIN_DISTANCE)
        angle = jnp.arctan2(delta[1], delta[0])
        value = jnp.maximum(
            0.0, 1.0 - jnp.abs(jnp.sum(
                delta / jnp.maximum(distance, 1e-9)
                * (direction / jnp.maximum(dirn, 1e-9)))))
        new_last = jnp.where(advance, p, last)
        return new_last, (angle, jnp.where(emit, value, 0.0))

    valid_sorted = s_slice < _MAX_SLICES
    _, (angles, values) = jax.lax.scan(
        step, sp[0], (sp, s_centroid, new_slice, valid_sorted))

    # Map angle to [0, pi): a vector and its inverse are the same angle.
    a = jnp.mod(angles, jnp.pi)
    bucket = jnp.clip(
        jnp.floor(histogram_size * a / jnp.pi - 0.5 + 0.5).astype(jnp.int32),
        0, histogram_size - 1)
    return jnp.zeros(histogram_size).at[bucket].add(values)


def rotate_histogram(histogram: jnp.ndarray, angle) -> jnp.ndarray:
    """Rotate the histogram *content* by +angle with linear interpolation
    between buckets (RotationalScanMatcher::RotateHistogram): a feature at
    angular bin b moves to bin b + angle * size / pi."""
    size = histogram.shape[0]
    shift = jnp.asarray(angle) * size / jnp.pi
    lo = jnp.floor(shift).astype(jnp.int32)
    frac = shift - lo
    upper = (jnp.arange(size) - lo) % size
    lower = (upper - 1) % size
    return (1.0 - frac) * histogram[upper] + frac * histogram[lower]


def match_histograms(submap_histogram: jnp.ndarray,
                     scan_histogram: jnp.ndarray,
                     angles: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity of the scan histogram rotated by each candidate
    angle against the submap histogram (RotationalScanMatcher::Match).
    Returns scores (A,)."""
    def score(angle):
        rotated = rotate_histogram(scan_histogram, angle)
        denom = (jnp.linalg.norm(rotated) * jnp.linalg.norm(submap_histogram))
        return jnp.sum(rotated * submap_histogram) / jnp.maximum(denom, 1e-9)

    return jax.vmap(score)(angles)
