"""Dump resolved configuration (reference: common/print_configuration_main.cc).

Usage:
  python -m cartographer_tpu.core.print_configuration_main \
      --configuration_directory DIR --configuration_basename FILE.lua
  python -m cartographer_tpu.core.print_configuration_main --defaults
"""

from __future__ import annotations

import argparse
import dataclasses
import sys


def _dump(obj, indent=0):
    pad = "  " * indent
    if dataclasses.is_dataclass(obj):
        lines = []
        for f in dataclasses.fields(obj):
            value = getattr(obj, f.name)
            if dataclasses.is_dataclass(value):
                lines.append(f"{pad}{f.name} = {{")
                lines.append(_dump(value, indent + 1))
                lines.append(f"{pad}}},")
            else:
                lines.append(f"{pad}{f.name} = {value!r},")
        return "\n".join(lines)
    return f"{pad}{obj!r}"


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="print_configuration")
    parser.add_argument("--configuration_directory")
    parser.add_argument("--configuration_basename")
    parser.add_argument("--defaults", action="store_true",
                        help="print the built-in defaults")
    args = parser.parse_args(argv)

    if args.defaults or not args.configuration_basename:
        from cartographer_tpu.core.config import (
            MapBuilderOptions,
            TrajectoryBuilderOptions,
        )
        print("MAP_BUILDER = {")
        print(_dump(MapBuilderOptions(), 1))
        print("}")
        print("TRAJECTORY_BUILDER = {")
        print(_dump(TrajectoryBuilderOptions(), 1))
        print("}")
        return 0

    from cartographer_tpu.core.lua_config import load_options

    mb, traj = load_options(args.configuration_basename,
                            [args.configuration_directory or "."])
    if mb is not None:
        print("MAP_BUILDER = {")
        print(_dump(mb, 1))
        print("}")
    if traj is not None:
        print("TRAJECTORY_BUILDER = {")
        print(_dump(traj, 1))
        print("}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
