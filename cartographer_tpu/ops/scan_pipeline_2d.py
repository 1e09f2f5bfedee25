"""Batched scan preprocessing for the 2D frontend [KERNEL].

Covers the per-point hot loop of LocalTrajectoryBuilder2D::AddRangeData
(mapping/internal/2d/local_trajectory_builder_2d.cc:104-225): motion
unwarping via pose interpolation, range gating, missing-data ray clamping,
gravity alignment, z-cropping and voxel filtering — as one fused device
program over the padded scan instead of a per-point host loop.

The host supplies the scan-start and scan-end poses from the PoseExtrapolator;
per-point poses are interpolated between them (translation lerp + rotation
slerp), which matches the extrapolator's own constant-velocity model between
queue updates.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from cartographer_tpu.sensor.point_cloud import PointCloud, RangeData
from cartographer_tpu.sensor.voxel_filter import voxel_filter_mask
from cartographer_tpu.transform import quaternion as quat
from cartographer_tpu.transform.interpolation import interpolate_rigid3
from cartographer_tpu.transform.rigid import Rigid3


@dataclasses.dataclass(frozen=True)
class ScanPreprocessParams2D:
    min_range: float = 0.0
    max_range: float = 30.0
    min_z: float = -0.8
    max_z: float = 2.0
    missing_data_ray_length: float = 5.0
    voxel_filter_size: float = 0.025


def preprocess_scan_2d(
    points: jnp.ndarray,  # (N, 3) in sensor/tracking frame
    times01: jnp.ndarray,  # (N,) in [0, 1]: fraction between start and end pose
    mask: jnp.ndarray,  # (N,)
    origin: jnp.ndarray,  # (N, 3) per-point sensor origins in tracking frame
    pose_start: Rigid3,  # tracking -> local at first point
    pose_end: Rigid3,  # tracking -> local at last point
    gravity_rotation: jnp.ndarray,  # (4,) quaternion: gravity orientation estimate
    params: ScanPreprocessParams2D,
    seed: jnp.ndarray,
) -> Tuple[RangeData, jnp.ndarray]:
    """Returns (gravity-aligned 2D RangeData, sensor origin in local frame).

    The returned RangeData is in the gravity-aligned frame centered at the
    scan-end sensor position (the frame the reference's
    TransformToGravityAlignedFrameAndFilter produces), with z dropped after
    cropping; the caller matches/inserts it through the estimated 2D pose.
    """
    poses = interpolate_rigid3(
        jax.tree_util.tree_map(lambda x: x[None], pose_start),
        jax.tree_util.tree_map(lambda x: x[None], pose_end),
        times01[:, None].squeeze(-1),
    )  # batched Rigid3 with leading dim N

    hits_local = poses.apply(points)  # (N, 3) in local frame
    origins_local = poses.apply(origin)  # per-point sensor origins
    # (local_trajectory_builder_2d.cc:168-170: origin_in_local =
    # range_data_poses[i] * origins.at(ranges[i].origin_index))
    deltas = hits_local - origins_local
    ranges = jnp.linalg.norm(deltas, axis=-1)

    is_return = mask & (ranges >= params.min_range) & (ranges <= params.max_range)
    # Beyond max_range: clamp to missing_data_ray_length as a free-space ray
    # (local_trajectory_builder_2d.cc:193-204).
    is_miss = mask & (ranges > params.max_range)
    safe_ranges = jnp.maximum(ranges, 1e-6)
    miss_points_local = origins_local + deltas * (
        params.missing_data_ray_length / safe_ranges)[:, None]

    # Gravity-align around the scan-end sensor position:
    # T = R_gravity * pose_end^-1  (local_trajectory_builder_2d.cc:222-224).
    align = Rigid3(jnp.zeros(3), gravity_rotation).compose(pose_end.inverse())
    hits_aligned = align.apply(hits_local)
    miss_aligned = align.apply(miss_points_local)
    # RangeData origin is the scan-end pose translation
    # (accumulated_range_data_.origin = range_data_poses.back().translation(),
    # local_trajectory_builder_2d.cc:201).
    origin_aligned = align.apply(pose_end.apply(jnp.zeros((1, 3), jnp.float32)))[0]

    # z-crop in the gravity-aligned frame (CropRangeData, min_z/max_z).
    in_z = (hits_aligned[..., 2] >= params.min_z) & (hits_aligned[..., 2] <= params.max_z)
    is_return = is_return & in_z
    miss_in_z = (miss_aligned[..., 2] >= params.min_z) & (miss_aligned[..., 2] <= params.max_z)
    is_miss = is_miss & miss_in_z

    # Voxel filter the returns at voxel_filter_size (3D cells, like reference).
    keep = voxel_filter_mask(hits_aligned, is_return, params.voxel_filter_size, seed)

    returns_2d = PointCloud(
        points=hits_aligned[..., 0:2], mask=keep,
        intensities=jnp.zeros(points.shape[0], jnp.float32))
    misses_2d = PointCloud(
        points=miss_aligned[..., 0:2], mask=is_miss,
        intensities=jnp.zeros(points.shape[0], jnp.float32))
    return RangeData(origin=origin_aligned[0:2], returns=returns_2d, misses=misses_2d), origin_aligned
