"""Map builder server main.

Reference: cloud/map_builder_server_main.cc — flags
-configuration_directory / -configuration_basename start a MapBuilderServer
from Lua config.

Usage:
  python -m cartographer_tpu.cloud.map_builder_server_main \
      --configuration_directory DIR --configuration_basename FILE.lua
"""

from __future__ import annotations

import argparse
import dataclasses
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="map_builder_server")
    parser.add_argument("--configuration_directory", required=False)
    parser.add_argument("--configuration_basename", required=False)
    parser.add_argument("--server_address", default=None)
    parser.add_argument("--use_2d", action="store_true", default=True)
    args = parser.parse_args(argv)

    from cartographer_tpu.core.config import (
        MapBuilderOptions,
        MapBuilderServerOptions,
        TrajectoryBuilderOptions,
    )

    traj_options = None
    if args.configuration_basename:
        from cartographer_tpu.core.lua_config import load_lua_file, load_options, map_builder_from_lua

        env = load_lua_file(args.configuration_basename,
                            [args.configuration_directory or "."])
        s = env.get("MAP_BUILDER_SERVER", {})
        mb = map_builder_from_lua(env["MAP_BUILDER"]) if "MAP_BUILDER" in env \
            else MapBuilderOptions(use_trajectory_builder_2d=True)
        if not mb.use_trajectory_builder_2d and not mb.use_trajectory_builder_3d:
            mb = dataclasses.replace(mb, use_trajectory_builder_2d=True)
        options = MapBuilderServerOptions(
            map_builder=mb,
            num_event_threads=s.get("num_event_threads", 4),
            num_grpc_threads=s.get("num_grpc_threads", 4),
            server_address=args.server_address or s.get("server_address",
                                                        "0.0.0.0:50051"),
            uplink_server_address=s.get("uplink_server_address", ""),
            upload_batch_size=s.get("upload_batch_size", 100))
        if "TRAJECTORY_BUILDER" in env:
            _, traj_options = load_options(
                args.configuration_basename, [args.configuration_directory or "."])
    else:
        options = MapBuilderServerOptions(
            map_builder=MapBuilderOptions(use_trajectory_builder_2d=True,
                                          collate_by_trajectory=True),
            server_address=args.server_address or "0.0.0.0:50051")

    from cartographer_tpu.cloud.server import MapBuilderServer

    server = MapBuilderServer(options, trajectory_options=traj_options)
    server.start()
    print(f"map builder server listening on port {server.port}", flush=True)
    try:
        server.wait_for_shutdown()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
