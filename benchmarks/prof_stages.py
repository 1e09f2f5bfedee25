"""Per-stage on-chip profiling of the 2D local-SLAM fused step (bench shapes).

Run:  python benchmarks/prof_stages.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from timing import timeit_scanned

from cartographer_tpu.ops.correlative_2d import (
    CorrelativeSearchParams, real_time_correlative_match)
from cartographer_tpu.ops.grid_2d import Grid2D, insert_range_data
from cartographer_tpu.ops.scan_matcher_2d import (
    GaussNewtonMatcherParams2D, gauss_newton_match_2d)
from cartographer_tpu.sensor.point_cloud import PointCloud, RangeData
from cartographer_tpu.sensor.voxel_filter import adaptive_voxel_filter
from cartographer_tpu.transform.rigid import Rigid2

N = 1024
GRID = 512
B = 8
MATCH_CAP = 512

corr_params = CorrelativeSearchParams(max_scan_range=10.0)
gn_params = GaussNewtonMatcherParams2D()

rng = np.random.RandomState(0)
angles = np.linspace(-np.pi, np.pi, N, endpoint=False)
radii = 8.0 + 1.5 * np.sin(3 * angles) + 0.02 * rng.randn(B, N)
pts = np.stack([radii * np.cos(angles), radii * np.sin(angles)], -1).astype(np.float32)
pts = jnp.asarray(pts)
masks = jnp.ones((B, N), bool)
seeds = jnp.asarray(np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(B)]))
poses = jnp.zeros((B, 3))
grids = jax.vmap(lambda c: Grid2D.create(GRID, 0.05, c))(jnp.zeros((B, 2)))


def filt(scan_points, mask, seed):
    cloud = PointCloud(points=scan_points, mask=mask,
                       intensities=jnp.zeros(N, jnp.float32))
    return adaptive_voxel_filter(cloud, 0.5, 200, 50.0, seed).compact(MATCH_CAP)


def corr(grid, filtered_pts, filtered_mask, pose_vec):
    prediction = Rigid2.from_vector(pose_vec)
    score, pose = real_time_correlative_match(
        grid, filtered_pts, filtered_mask, prediction, corr_params)
    return pose.to_vector()


def gn(grid, filtered_pts, filtered_mask, coarse_vec, pose_vec):
    coarse = Rigid2.from_vector(coarse_vec)
    prediction = Rigid2.from_vector(pose_vec)
    pose, _ = gauss_newton_match_2d(grid, filtered_pts, filtered_mask, coarse,
                                    gn_params,
                                    target_translation=prediction.translation)
    return pose.to_vector()


def insert(grid, scan_points, mask, pose_vec):
    pose = Rigid2.from_vector(pose_vec)
    cloud = PointCloud(points=scan_points, mask=mask,
                       intensities=jnp.zeros(N, jnp.float32))
    rd = RangeData(origin=pose.translation, returns=cloud.transform(pose),
                   misses=PointCloud.empty(N, 2))
    return insert_range_data(grid, rd)


filtered = jax.jit(jax.vmap(filt))(pts, masks, seeds)
fp = jax.block_until_ready(filtered)

timeit_scanned(
    "adaptive_voxel_filter+compact", jax.vmap(filt),
    lambda c, a: (a[0] + c * 1e-6, a[1], a[2]),
    pts, masks, seeds)
timeit_scanned(
    "correlative_match", jax.vmap(corr),
    lambda c, a: (a[0], a[1] + c * 1e-7, a[2], a[3]),
    grids, filtered.points, filtered.mask, poses)
timeit_scanned(
    "gauss_newton", jax.vmap(gn),
    lambda c, a: (a[0], a[1] + c * 1e-7, a[2], a[3], a[4]),
    grids, filtered.points, filtered.mask, poses, poses)
timeit_scanned(
    "insert_range_data", jax.vmap(insert),
    lambda c, a: (a[0], a[1] + c * 1e-6, a[2], a[3]),
    grids, pts, masks, poses)
