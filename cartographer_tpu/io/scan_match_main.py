"""Offline scan-matching testbed CLI.

Fork parity: io/wangtest_main.cc — match two point clouds (pcd files) with a
selectable matcher (`mode: ceres | icp | gicp | ndt`, the fork's
scanmatch_mode dispatch in local_trajectory_builder_3d.cc:758-775),
configured from a yaml file (testcfg.yaml style).

Usage:
  python -m cartographer_tpu.io.scan_match_main --config testcfg.yaml
  python -m cartographer_tpu.io.scan_match_main --source a.pcd --target b.pcd --mode icp
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def run(source_path: str, target_path: str, mode: str,
        init: list, max_iterations: int, resolution: float,
        max_correspondence_distance: float) -> dict:
    import jax.numpy as jnp

    from cartographer_tpu.io.pcd import read_pcd
    from cartographer_tpu.ops.icp import (
        IcpParams,
        NdtParams,
        gicp_match,
        icp_match,
        ndt_match,
    )
    from cartographer_tpu.ops.grid_3d import Grid3D, insert_range_data_3d
    from cartographer_tpu.ops.scan_matcher_3d import (
        GaussNewtonMatcherParams3D,
        gauss_newton_match_3d,
    )
    from cartographer_tpu.transform import Rigid3, quaternion as quat

    source = read_pcd(source_path)
    target = read_pcd(target_path)
    cap = 1 << int(np.ceil(np.log2(max(len(source), len(target), 16))))

    def pad(pts):
        out = np.zeros((cap, 3), np.float32)
        out[: len(pts)] = pts[:cap]
        m = np.zeros(cap, bool)
        m[: len(pts)] = True
        return jnp.asarray(out), jnp.asarray(m)

    src, sm = pad(source)
    tgt, tm = pad(target)
    initial = Rigid3(jnp.asarray(init[:3], jnp.float32),
                     quat.from_axis_angle(jnp.asarray(init[3:6], jnp.float32)))

    extras = {}
    if mode == "icp":
        pose, fitness, rmse = icp_match(
            src, sm, tgt, tm, initial,
            IcpParams(max_iterations=max_iterations,
                      max_correspondence_distance=max_correspondence_distance))
        extras = {"fitness": float(fitness), "rmse": float(rmse)}
    elif mode == "gicp":
        pose, fitness, rmse = gicp_match(
            src, sm, tgt, tm, initial,
            IcpParams(max_iterations=max_iterations,
                      max_correspondence_distance=max_correspondence_distance))
        extras = {"fitness": float(fitness), "rmse": float(rmse)}
    elif mode == "ndt":
        pose, cost = ndt_match(
            src, sm, tgt, tm, initial,
            NdtParams(resolution=resolution, max_iterations=max_iterations))
        extras = {"cost": float(cost)}
    elif mode == "ceres":
        # Grid-based Gauss-Newton: rasterize the target into an occupancy
        # grid pair and refine (the fork's scanmatch_mode 1).
        center = target.mean(0)
        high = Grid3D.create(128, resolution, jnp.asarray(center, jnp.float32))
        low = Grid3D.create(64, resolution * 3, jnp.asarray(center, jnp.float32))
        origin = jnp.asarray(center, jnp.float32)
        for _ in range(4):
            high = insert_range_data_3d(high, origin, tgt, tm)
            low = insert_range_data_3d(low, origin, tgt, tm)
        pose, cost = gauss_newton_match_3d(
            high, low, src, sm, src, sm, initial,
            GaussNewtonMatcherParams3D(num_iterations=max_iterations,
                                       translation_weight=0.1,
                                       rotation_weight=1.0))
        extras = {"cost": float(cost)}
    else:
        raise ValueError(f"unknown mode {mode!r}")

    aa = np.asarray(quat.to_axis_angle(pose.rotation))
    return {
        "mode": mode,
        "translation": [float(x) for x in np.asarray(pose.translation)],
        "rotation_axis_angle": [float(x) for x in aa],
        **extras,
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="scan_match")
    parser.add_argument("--config", help="yaml config (testcfg.yaml style)")
    parser.add_argument("--source")
    parser.add_argument("--target")
    parser.add_argument("--mode", default="icp",
                        choices=["ceres", "icp", "gicp", "ndt"])
    parser.add_argument("--max_iterations", type=int, default=30)
    parser.add_argument("--resolution", type=float, default=0.3)
    parser.add_argument("--max_correspondence_distance", type=float, default=1.0)
    args = parser.parse_args(argv)

    cfg = {}
    if args.config:
        import yaml

        cfg = yaml.safe_load(open(args.config)) or {}
    source = cfg.get("source", args.source)
    target = cfg.get("target", args.target)
    if not source or not target:
        parser.error("--source/--target (or config entries) required")
    result = run(
        source, target,
        mode=cfg.get("mode", args.mode),
        init=cfg.get("init", [0, 0, 0, 0, 0, 0]),
        max_iterations=cfg.get("max_iterations", args.max_iterations),
        resolution=cfg.get("resolution", args.resolution),
        max_correspondence_distance=cfg.get(
            "max_correspondence_distance", args.max_correspondence_distance))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
