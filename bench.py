"""Benchmark: 2D local-SLAM throughput (scans/sec) on one chip.

Measures the fused per-scan pipeline (adaptive voxel filter -> real-time
correlative search -> Gauss-Newton refine -> polar raycast insertion) in the
multi-trajectory serving configuration: B independent trajectories advance
one scan per device step via vmap (the map-builder-server workload — the
reference would run B separate CPU processes). Scans vary per step; device
dispatch is a single fused program per step.

Baseline: the reference (pure C++ Cartographer) publishes no numbers; its
design target is real-time operation (local_trajectory_builder_2d.cc
real-time-ratio metric ~1.0) on the Deutsches Museum bags, whose two
revolving laser scanners produce ~40 Hz x 2 = ~80-100 scans/sec. We take
100 scans/sec as the reference-parity denominator, so vs_baseline is the
real-time multiple (target from BASELINE.md: > 10).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REFERENCE_SCANS_PER_SEC = 100.0


def main():
    import jax
    import jax.numpy as jnp

    from cartographer_tpu.ops.correlative_2d import (
        CorrelativeSearchParams,
        real_time_correlative_match,
    )
    from cartographer_tpu.ops.grid_2d import Grid2D, insert_range_data
    from cartographer_tpu.ops.scan_matcher_2d import (
        GaussNewtonMatcherParams2D,
        gauss_newton_match_2d,
    )
    from cartographer_tpu.sensor.point_cloud import PointCloud, RangeData
    from cartographer_tpu.sensor.voxel_filter import adaptive_voxel_filter
    from cartographer_tpu.transform.rigid import Rigid2

    # Deutsches-Museum-like shapes: ~1k points/scan after merging, 5 cm grid.
    N = 1024
    GRID = 512
    B = 8  # concurrent trajectories (multi-robot serving)
    STEPS = 32

    # max_scan_range bounds the static angular candidate count; the bench
    # scans have ~9.5 m radius (the reference derives its step from the same
    # radius).
    corr_params = CorrelativeSearchParams(max_scan_range=10.0)
    gn_params = GaussNewtonMatcherParams2D()

    def one_scan(grid, scan_points, mask, pose_pred_vec, seed):
        cloud = PointCloud(points=scan_points, mask=mask,
                           intensities=jnp.zeros(N, jnp.float32))
        filtered = adaptive_voxel_filter(cloud, 0.5, 200, 50.0, seed)
        prediction = Rigid2.from_vector(pose_pred_vec)
        _, coarse = real_time_correlative_match(
            grid, filtered.points, filtered.mask, prediction, corr_params)
        pose, _ = gauss_newton_match_2d(
            grid, filtered.points, filtered.mask, coarse, gn_params,
            target_translation=prediction.translation)
        rd = RangeData(origin=pose.translation,
                       returns=cloud.transform(pose),
                       misses=PointCloud.empty(N, 2))
        new_grid = insert_range_data(grid, rd)
        return new_grid, pose.to_vector()

    step_fn = jax.jit(jax.vmap(one_scan), donate_argnums=(0,))

    rng = np.random.RandomState(0)
    angles = np.linspace(-np.pi, np.pi, N, endpoint=False)
    scans = np.zeros((STEPS, B, N, 2), np.float32)
    for i in range(STEPS):
        for b in range(B):
            radii = (8.0 + 1.5 * np.sin(3 * angles + 0.01 * i + 0.5 * b)
                     + 0.02 * rng.randn(N))
            scans[i, b] = np.stack(
                [radii * np.cos(angles), radii * np.sin(angles)], -1)
    scans = jnp.asarray(scans)
    masks = jnp.ones((B, N), bool)
    seeds = jnp.asarray(np.stack([np.asarray(jax.random.PRNGKey(i))
                                  for i in range(B)]))

    def fresh_grids():
        return jax.vmap(lambda c: Grid2D.create(GRID, 0.05, c))(jnp.zeros((B, 2)))

    def run(grids):
        poses = jnp.zeros((B, 3))
        for i in range(STEPS):
            grids, poses = step_fn(grids, scans[i], masks, poses, seeds)
        return grids, poses

    # Warmup / compile.
    g, p = run(fresh_grids())
    jax.block_until_ready((g, p))

    times = []
    for _ in range(3):
        g = fresh_grids()
        start = time.perf_counter()
        g, p = run(g)
        jax.block_until_ready((g, p))
        times.append(time.perf_counter() - start)
    best = min(times)
    scans_per_sec = B * STEPS / best

    print(json.dumps({
        "metric": "local_slam_2d_scans_per_sec",
        "value": round(scans_per_sec, 2),
        "unit": ("scans/sec aggregate (8 concurrent trajectories, 1024-pt "
                 "scans, 512x512 5cm grids, 1 chip)"),
        "vs_baseline": round(scans_per_sec / REFERENCE_SCANS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
