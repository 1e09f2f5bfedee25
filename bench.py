"""Benchmark: 2D local-SLAM throughput (scans/sec) on one chip.

Primary metric: the fused per-scan pipeline (adaptive voxel filter ->
Gauss-Newton scan matching -> polar raycast insertion) in the reference's
DEFAULT 2D configuration (trajectory_builder_2d.lua:
use_online_correlative_scan_matching = false), serving B independent
trajectories per device step via vmap, STEPS steps chained inside one
compiled lax.scan (device-resident streaming; the map-builder-server
workload — the reference would run B separate CPU processes).

Extras (same JSON line): the correlative-matcher-enabled pipeline, 2D
loop-closure matching (pyramid + beam BnB) throughput, and the 3D frontend.

Timing methodology: the TPU sits behind a network tunnel where
jax.block_until_ready does NOT reliably synchronize, so every measurement
fetches a scalar reduced from all outputs and reports the slope between two
in-program iteration counts (cancels the ~27 ms RTT and dispatch overheads).
See benchmarks/timing.py.

Baseline: the reference (pure C++ Cartographer) publishes no numbers; its
design target is real-time operation (local_trajectory_builder_2d.cc
real-time-ratio metric ~1.0) on the Deutsches Museum bags, whose two
revolving laser scanners produce ~40 Hz x 2 = ~80-100 scans/sec. We take
100 scans/sec as the reference-parity denominator, so vs_baseline is the
real-time multiple (target from BASELINE.md: > 10).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
"""

import json
import time

import numpy as np

REFERENCE_SCANS_PER_SEC = 100.0

N = 1024
GRID = 512
B = 16
MATCH_CAP = 512


def _measure(make_run, ks=(4, 16), reps=3):
    """Seconds per iteration: slope between two in-program repeat counts."""
    import jax

    fns = {k: jax.jit(make_run(k)) for k in ks}
    for f in fns.values():
        float(f())  # compile + warm
    times = {}
    for k, f in fns.items():
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f())
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])


def bench_pipeline_2d(use_correlative: bool):
    import jax
    import jax.numpy as jnp

    from cartographer_tpu.ops.correlative_2d import (
        CorrelativeSearchParams, real_time_correlative_match)
    from cartographer_tpu.ops.grid_2d import Grid2D, insert_range_data
    from cartographer_tpu.ops.scan_matcher_2d import (
        GaussNewtonMatcherParams2D, gauss_newton_match_2d)
    from cartographer_tpu.sensor.point_cloud import PointCloud, RangeData
    from cartographer_tpu.sensor.voxel_filter import adaptive_voxel_filter
    from cartographer_tpu.transform.rigid import Rigid2

    corr_params = CorrelativeSearchParams(max_scan_range=10.0)
    gn_params = GaussNewtonMatcherParams2D()

    rng = np.random.RandomState(0)
    angles = np.linspace(-np.pi, np.pi, N, endpoint=False)
    STEPS = 4  # scans per in-program iteration (x the measured slope count)
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

    def one_scan(grid, scan_points, mask, pose_pred_vec, seed):
        cloud = PointCloud(points=scan_points, mask=mask,
                           intensities=jnp.zeros(N, jnp.float32))
        filtered = adaptive_voxel_filter(cloud, 0.5, 200, 50.0, seed)
        filtered = filtered.compact(MATCH_CAP)
        # Loop-closure node cloud (production computes it per scan).
        lc = adaptive_voxel_filter(cloud, 0.9, 100, 50.0, seed).compact(256)
        prediction = Rigid2.from_vector(pose_pred_vec)
        initial = prediction
        if use_correlative:
            _, initial = real_time_correlative_match(
                grid, filtered.points, filtered.mask, prediction, corr_params)
        pose, _ = gauss_newton_match_2d(
            grid, filtered.points, filtered.mask, initial, gn_params,
            target_translation=prediction.translation)
        rd = RangeData(origin=pose.translation,
                       returns=cloud.transform(pose),
                       misses=PointCloud.empty(N, 2))
        new_grid = insert_range_data(grid, rd)
        return new_grid, pose.to_vector() + 1e-20 * jnp.sum(lc.points)

    step_fn = jax.vmap(one_scan)

    def make_run(k):
        def run():
            grids = jax.vmap(lambda c: Grid2D.create(GRID, 0.05, c))(
                jnp.zeros((B, 2)))
            poses = jnp.zeros((B, 3))

            def body(carry, i):
                grids, poses = carry
                s = scans[i % STEPS] + 1e-6 * i.astype(jnp.float32)
                grids, poses = step_fn(grids, s, masks, poses, seeds)
                return (grids, poses), None

            (grids, poses), _ = jax.lax.scan(
                body, (grids, poses), jnp.arange(k * STEPS))
            return jnp.sum(poses) + jnp.sum(grids.log_odds[:, ::64, ::64])

        return run

    sec_per_iter = _measure(make_run)
    return B * STEPS / sec_per_iter


def bench_bnb_2d():
    """Loop-closure constraint matching, PRODUCTION path: per-submap
    precomputation pyramids are cached (built once), and a batch of
    (node, submap) candidate pairs runs through the vmapped BnB + GN-refine
    program that ConstraintBuilder2D dispatches (constraint_builder_2d.py
    _batched_match_fn) — the reference's thread-pool fan-out
    (constraint_builder_2d.cc:102-186) as one device program."""
    import jax
    import jax.numpy as jnp

    from cartographer_tpu.mapping.constraint_builder_2d import _batched_match_fn
    from cartographer_tpu.ops.bnb_2d import (
        FastCorrelativeMatcherParams2D, build_precomputation_pyramid)
    from cartographer_tpu.ops.grid_2d import Grid2D
    from cartographer_tpu.ops.scan_matcher_2d import GaussNewtonMatcherParams2D

    params = FastCorrelativeMatcherParams2D(
        linear_search_window=4.0, angular_search_window=np.radians(30.0),
        branch_and_bound_depth=6, max_scan_range=12.0)
    gn_params = GaussNewtonMatcherParams2D(num_iterations=10)
    S = 512
    NP = 256  # loop_closure_capacity node clouds
    BATCH = 16  # pairs per dispatch (constraint_builder_2d._MAX_CHUNK)
    rng = np.random.RandomState(0)
    angles = np.linspace(-np.pi, np.pi, NP, endpoint=False)
    pts = np.zeros((BATCH, NP, 2), np.float32)
    for b in range(BATCH):
        radii = 8.0 + 1.5 * np.sin(3 * angles + 0.3 * b) + 0.02 * rng.randn(NP)
        pts[b] = np.stack([radii * np.cos(angles), radii * np.sin(angles)], -1)
    pts = jnp.asarray(pts)
    masks = jnp.ones((BATCH, NP), bool)
    grid = Grid2D.create(S, 0.05, jnp.zeros(2))
    grids = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (BATCH,) + x.shape), grid)
    prob = jnp.asarray(rng.rand(S, S).astype(np.float32))
    pyramid = build_precomputation_pyramid(prob, params.branch_and_bound_depth)
    pyramids = jnp.broadcast_to(pyramid, (BATCH,) + pyramid.shape)
    inits = jnp.zeros((BATCH, 3), jnp.float32)
    match = _batched_match_fn(params, gn_params, None, None)

    # Dispatch k batches back-to-back WITHOUT intermediate fetches (the
    # device queue pipelines them), fetch one scalar at the end; the slope
    # between two k values cancels the single round-trip. (Wrapping the
    # matcher in a lax.scan instead compiles a program that faults the TPU
    # runtime — pipelined dispatch is also what production does.)
    def timed(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(k):
                scores, poses = match(pyramids, grids, pts, masks, inits)
            float(jnp.sum(scores) + jnp.sum(poses))
            best = min(best, time.perf_counter() - t0)
        return best

    float(jnp.sum(match(pyramids, grids, pts, masks, inits)[0]))  # compile
    t4, t16 = timed(4), timed(16)
    sec_per_dispatch = (t16 - t4) / 12
    return BATCH / sec_per_dispatch


def bench_pipeline_3d():
    """3D frontend: two-resolution filter + SE(3) GN match + dual-grid insert."""
    import jax
    import jax.numpy as jnp

    from cartographer_tpu.ops.grid_3d import Grid3D, insert_range_data_3d
    from cartographer_tpu.ops.scan_matcher_3d import (
        GaussNewtonMatcherParams3D, gauss_newton_match_3d)
    from cartographer_tpu.sensor.point_cloud import PointCloud
    from cartographer_tpu.sensor.voxel_filter import adaptive_voxel_filter
    from cartographer_tpu.transform.rigid import Rigid3

    B3 = 4
    N3 = 2048
    S3 = 128
    gn_params = GaussNewtonMatcherParams3D()
    rng = np.random.RandomState(0)
    pts = rng.randn(B3, N3, 3).astype(np.float32) * 3.0
    pts = jnp.asarray(pts)
    masks = jnp.ones((B3, N3), bool)
    seeds = jnp.asarray(np.stack([np.asarray(jax.random.PRNGKey(i))
                                  for i in range(B3)]))

    def one_scan(high_grid, low_grid, points, mask, pose_t, seed):
        cloud = PointCloud(points=points, mask=mask,
                           intensities=jnp.zeros(N3, jnp.float32))
        high = adaptive_voxel_filter(cloud, 2.0, 150, 15.0, seed).compact(256)
        low = adaptive_voxel_filter(cloud, 4.0, 200, 60.0, seed).compact(512)
        pose = Rigid3(pose_t, jnp.array([1.0, 0, 0, 0]))
        refined, cost = gauss_newton_match_3d(
            high_grid, low_grid, high.points, high.mask, low.points, low.mask,
            pose, gn_params)
        world = refined.apply(cloud.points)
        hg = insert_range_data_3d(high_grid, refined.translation, world,
                                  cloud.mask)
        lg = insert_range_data_3d(low_grid, refined.translation, world,
                                  cloud.mask)
        return hg, lg, refined.translation

    step_fn = jax.vmap(one_scan)

    def make_run(k):
        def run():
            hg = jax.vmap(lambda c: Grid3D.create(S3, 0.1, c))(jnp.zeros((B3, 3)))
            lg = jax.vmap(lambda c: Grid3D.create(S3 // 2, 0.45, c))(
                jnp.zeros((B3, 3)))
            ts = jnp.zeros((B3, 3))

            def body(carry, i):
                hg, lg, ts = carry
                p = pts + 1e-6 * i.astype(jnp.float32)
                hg, lg, ts = step_fn(hg, lg, p, masks, ts, seeds)
                return (hg, lg, ts), None

            (hg, lg, ts), _ = jax.lax.scan(body, (hg, lg, ts), jnp.arange(k))
            return jnp.sum(ts) + jnp.sum(hg.log_odds[:, ::16, ::16, ::16])

        return run

    sec_per_iter = _measure(make_run, ks=(2, 8))
    return B3 / sec_per_iter


def bench_e2e_serving(num_robots: int = 16, scans_per_robot: int = 25):
    """MapBuilder-level end-to-end throughput: N concurrent robot threads
    each drive a full LocalTrajectoryBuilder2D (collator, extrapolator,
    per-scan host<->device marshalling and value syncs included). Over this
    machine's tunnel every scan pays device RTTs; the threads overlap them,
    which is exactly the serving configuration. NOTE: on this driver the
    chip is remote (~27 ms RTT per sync), so this number is tunnel-latency
    bound, not compute bound — local-chip deployments see device-call
    latencies three orders of magnitude lower."""
    import math
    import threading

    from cartographer_tpu.core.config import (
        TrajectoryBuilder2DOptions, apply_overrides)
    from cartographer_tpu.core.time import from_seconds
    from cartographer_tpu.mapping.local_trajectory_builder_2d import (
        LocalTrajectoryBuilder2D)
    from cartographer_tpu.sensor.data import TimedPointCloudData

    opts = apply_overrides(TrajectoryBuilder2DOptions(), {
        "use_imu_data": False,
        "max_range": 12.0,
        "adaptive_voxel_filter.min_num_points": 150,
        "motion_filter.max_distance_meters": 0.05,
        "tpu.scan_capacity": 1024,
        "tpu.submap_grid_size": 512,
    })
    rng = np.random.RandomState(0)
    n = 720
    ang = np.linspace(-np.pi, np.pi, n, endpoint=False)
    world = np.stack([(8 + 1.5 * np.sin(3 * ang)) * np.cos(ang),
                      (8 + 1.5 * np.sin(3 * ang)) * np.sin(ang)],
                     -1).astype(np.float32)

    def scan_at(x):
        d = world - np.array([x, 0.0], np.float32)
        return np.concatenate([d, np.zeros((n, 1), np.float32)], -1)

    builders = [LocalTrajectoryBuilder2D(opts, ["laser"])
                for _ in range(num_robots)]
    # Warm/compile on one builder (jit programs are shared across builders).
    t0c = 1_000_000_000
    warm = LocalTrajectoryBuilder2D(opts, ["laser"])
    for i in range(3):
        warm.add_range_data("laser", TimedPointCloudData(
            time=t0c + from_seconds(i * 0.1), origin=np.zeros(3, np.float32),
            ranges=scan_at(0.05 * i), times=np.zeros(n, np.float32)))

    done = []

    def drive(b):
        for i in range(scans_per_robot):
            b.add_range_data("laser", TimedPointCloudData(
                time=t0c + from_seconds(i * 0.1),
                origin=np.zeros(3, np.float32),
                ranges=scan_at(0.04 * i), times=np.zeros(n, np.float32)))
        done.append(1)

    threads = [threading.Thread(target=drive, args=(b,)) for b in builders]
    start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - start
    assert len(done) == num_robots
    throughput = num_robots * scans_per_robot / wall

    # Device-interaction accounting + RTT-floor model (VERDICT r2 item 5):
    # each scan is ONE fused dispatch + ONE batched fetch, so with R threads
    # overlapping their round-trips the ceiling is ~ R / (fetches_per_scan
    # * RTT). Measure the per-fetch round-trip with a tiny value sync.
    import jax
    import jax.numpy as jnp
    fetches_per_scan = sum(b.device_fetches for b in builders) / max(
        1, num_robots * scans_per_robot)
    tiny = jax.jit(lambda x: x + 1)
    float(tiny(jnp.float32(0)))  # compile
    t0 = time.perf_counter()
    reps = 20
    for i in range(reps):
        float(tiny(jnp.float32(i)))
    rtt = (time.perf_counter() - t0) / reps
    model = num_robots / max(fetches_per_scan * rtt, 1e-9)
    return throughput, {
        "device_fetches_per_scan": round(fetches_per_scan, 2),
        "measured_rtt_ms": round(rtt * 1e3, 2),
        "rtt_floor_model_scans_per_sec": round(model, 1),
    }


def main():
    primary = bench_pipeline_2d(use_correlative=False)
    extras = {}
    try:
        extras["local_slam_2d_with_online_correlative_scans_per_sec"] = round(
            bench_pipeline_2d(use_correlative=True), 2)
    except Exception as e:  # noqa: BLE001
        extras["local_slam_2d_with_online_correlative_scans_per_sec"] = str(e)
    try:
        extras["loop_closure_bnb_matches_per_sec"] = round(bench_bnb_2d(), 2)
    except Exception as e:  # noqa: BLE001
        extras["loop_closure_bnb_matches_per_sec"] = str(e)
    try:
        extras["local_slam_3d_scans_per_sec"] = round(bench_pipeline_3d(), 2)
    except Exception as e:  # noqa: BLE001
        extras["local_slam_3d_scans_per_sec"] = str(e)
    try:
        e2e, e2e_info = bench_e2e_serving()
        extras["e2e_map_builder_scans_per_sec_16_robots"] = round(e2e, 2)
        extras.update(e2e_info)
    except Exception as e:  # noqa: BLE001
        extras["e2e_map_builder_scans_per_sec_16_robots"] = str(e)

    print(json.dumps({
        "metric": "local_slam_2d_scans_per_sec",
        "value": round(primary, 2),
        "unit": (f"scans/sec aggregate ({B} concurrent trajectories, 1024-pt "
                 "scans, 512x512 5cm grids, reference-default 2D config, "
                 "1 chip, value-fetch-synced slope timing)"),
        "vs_baseline": round(primary / REFERENCE_SCANS_PER_SEC, 2),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
