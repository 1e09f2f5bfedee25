"""Padded, masked point clouds for static-shape TPU pipelines.

Reference equivalents: sensor/point_cloud.{h,cc}, sensor/range_data.{h,cc},
sensor/timed_point_cloud_data.h. The reference stores dynamically-sized
std::vectors; here every cloud has a static capacity N with a validity mask so
point counts can vary per scan without recompilation, and whole scans
transform in single vectorized ops.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _pad_to(arr: np.ndarray, capacity: int, fill=0.0) -> np.ndarray:
    n = arr.shape[0]
    if n > capacity:
        raise ValueError(f"point count {n} exceeds capacity {capacity}")
    pad = [(0, capacity - n)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """Fixed-capacity point cloud: points (N, D), mask (N,), intensities (N,).

    D is 2 or 3. Padded entries have mask == False; their coordinates are
    finite (zeros) so they flow through arithmetic safely and must always be
    excluded via the mask at reduction sites.
    """

    points: jnp.ndarray
    mask: jnp.ndarray
    intensities: jnp.ndarray

    @staticmethod
    def from_numpy(points: np.ndarray, capacity: int,
                   intensities: Optional[np.ndarray] = None) -> "PointCloud":
        points = np.asarray(points, np.float32)
        n = points.shape[0]
        mask = np.zeros(capacity, bool)
        mask[:n] = True
        inten = np.zeros(n, np.float32) if intensities is None else np.asarray(intensities, np.float32)
        return PointCloud(
            jnp.asarray(_pad_to(points, capacity)),
            jnp.asarray(mask),
            jnp.asarray(_pad_to(inten, capacity)),
        )

    @staticmethod
    def empty(capacity: int, dim: int) -> "PointCloud":
        return PointCloud(
            jnp.zeros((capacity, dim), jnp.float32),
            jnp.zeros(capacity, bool),
            jnp.zeros(capacity, jnp.float32),
        )

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    @property
    def dim(self) -> int:
        return self.points.shape[-1]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32))

    def transform(self, pose) -> "PointCloud":
        """Apply a Rigid2 (D=2) or Rigid3 (D=3) to all points."""
        return dataclasses.replace(self, points=pose.apply(self.points))

    def filter_mask(self, keep: jnp.ndarray) -> "PointCloud":
        return dataclasses.replace(self, mask=self.mask & keep)

    def compact(self, capacity: int) -> "PointCloud":
        """Pack valid points to the front and truncate to `capacity`.

        The adaptive voxel filter keeps ~min_num_points of a much larger
        padded cloud; downstream matchers pay per-capacity cost (count-image
        matmuls scale with N), so shrinking the static capacity after
        filtering is a direct hot-path win. Points beyond `capacity` are
        dropped (callers size capacity >= the filter's target point count).
        """
        order = jnp.argsort(~self.mask, stable=True)[:capacity]
        if jax.default_backend() == "tpu":
            # Gather-free compaction: the row gather points[order] is
            # memory-latency bound on TPU; a thin one-hot matmul
            # (capacity x N) @ (N x D) does the same permutation on the MXU.
            from cartographer_tpu.ops.onehot import onehot_rows

            sel = onehot_rows(order, jnp.ones_like(order, bool),
                              self.capacity, dtype=jnp.float32)
            gathered = jnp.dot(
                sel, jnp.concatenate(
                    [self.points, self.mask[:, None].astype(jnp.float32),
                     self.intensities[:, None]], axis=-1),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            d = self.points.shape[-1]
            return PointCloud(
                points=gathered[:, :d],
                mask=gathered[:, d] > 0.5,
                intensities=gathered[:, d + 1],
            )
        return PointCloud(
            points=self.points[order],
            mask=self.mask[order],
            intensities=self.intensities[order],
        )

    def to_numpy(self) -> np.ndarray:
        """Valid points as a dense (n, D) numpy array (host sync)."""
        m = np.asarray(self.mask)
        return np.asarray(self.points)[m]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TimedPointCloud:
    """PointCloud + per-point relative time (seconds; last point == 0).

    Reference: sensor::TimedPointCloudData (per-point times for unwarping,
    sensor/timed_point_cloud_data.h).
    """

    points: jnp.ndarray  # (N, D)
    times: jnp.ndarray  # (N,) seconds relative to the cloud's timestamp
    mask: jnp.ndarray  # (N,)
    intensities: jnp.ndarray  # (N,)

    @staticmethod
    def from_numpy(points: np.ndarray, times: np.ndarray, capacity: int,
                   intensities: Optional[np.ndarray] = None) -> "TimedPointCloud":
        points = np.asarray(points, np.float32)
        n = points.shape[0]
        mask = np.zeros(capacity, bool)
        mask[:n] = True
        inten = np.zeros(n, np.float32) if intensities is None else np.asarray(intensities, np.float32)
        return TimedPointCloud(
            jnp.asarray(_pad_to(points, capacity)),
            jnp.asarray(_pad_to(np.asarray(times, np.float32), capacity)),
            jnp.asarray(mask),
            jnp.asarray(_pad_to(inten, capacity)),
        )

    @property
    def capacity(self) -> int:
        return self.points.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RangeData:
    """origin (D,) + returns/misses clouds (reference sensor::RangeData).

    `returns` are laser hits; `misses` are free-space-only ray endpoints
    (from missing_data_ray_length clamping).
    """

    origin: jnp.ndarray
    returns: PointCloud
    misses: PointCloud

    def transform(self, pose) -> "RangeData":
        return RangeData(
            pose.apply(self.origin),
            self.returns.transform(pose),
            self.misses.transform(pose),
        )

    def crop_z(self, min_z: float, max_z: float) -> "RangeData":
        """Keep points with z in [min_z, max_z] (3D clouds only)."""
        def crop(pc: PointCloud) -> PointCloud:
            z = pc.points[..., 2]
            return pc.filter_mask((z >= min_z) & (z <= max_z))

        return RangeData(self.origin, crop(self.returns), crop(self.misses))
