"""pbstream CLI: `python -m cartographer_tpu.io.pbstream_main info|migrate <file>`.

Reference: cartographer/io/pbstream_main.cc (+ internal/pbstream_info.cc,
pbstream_migrate.cc).
"""

from __future__ import annotations

import argparse
import sys

import msgpack

from cartographer_tpu.io.pbstream import ProtoStreamReader, ProtoStreamWriter
from cartographer_tpu.io.serialization import SERIALIZATION_FORMAT_VERSION, _migrate_v1


def info(path: str, verbose: bool = False) -> int:
    reader = ProtoStreamReader(path)
    records = list(reader)
    reader.close()
    counts = {}
    version = None

    from cartographer_tpu.io.carto_pbstream import is_carto_stream

    if records and is_carto_stream(records[0]):
        # A reference-schema pbstream (pbstream_info.cc counts SerializedData
        # cases the same way).
        from cartographer_tpu.io import carto_protos as cp
        from cartographer_tpu.io.proto_wire import decode_message

        version = decode_message(cp.SERIALIZATION_HEADER,
                                 records[0]).get("format_version")
        print("schema: cartographer proto")
        for r in records[1:]:
            msg = decode_message(cp.SERIALIZED_DATA, r)
            kind = next(iter(msg), "unknown")
            counts[kind] = counts.get(kind, 0) + 1
    else:
        print("schema: cartographer_tpu native")
        for record in records:
            try:
                msg = msgpack.unpackb(record, raw=False)
                kind = msg.get("type", "unknown")
                if kind == "header":
                    version = msg.get("format_version")
            except Exception:
                kind = "opaque"
            counts[kind] = counts.get(kind, 0) + 1
    print(f"format_version: {version}")
    for kind in sorted(counts):
        print(f"{kind}: {counts[kind]}")
    return 0


def _migrate_carto(src: str, dst: str) -> int:
    """Migrate a reference-schema pbstream: load (v1 streams get the
    submap-histogram redistribution of serialization_format_migration.cc
    applied by load_carto_state) and rewrite at the current version."""
    from cartographer_tpu.core.config import MapBuilderOptions
    from cartographer_tpu.io import carto_protos as cp
    from cartographer_tpu.io.proto_wire import decode_message
    from cartographer_tpu.mapping.map_builder import MapBuilder

    reader = ProtoStreamReader(src)
    records = list(reader)
    reader.close()
    header = decode_message(cp.SERIALIZATION_HEADER, records[0])
    version = header.get("format_version", 0)
    # Sniff 2D vs 3D from the first submap payload.
    is_3d = False
    for rec in records[1:]:
        msg = decode_message(cp.SERIALIZED_DATA, rec)
        if "submap" in msg:
            is_3d = "submap_3d" in msg["submap"]
            break
    mb = MapBuilder(MapBuilderOptions(
        use_trajectory_builder_2d=not is_3d, use_trajectory_builder_3d=is_3d))
    mb.load_state(src, load_frozen_state=False)
    mb.serialize_state(dst, include_unfinished_submaps=True, format="carto")
    print(f"migrated carto v{version} -> v2: {dst}")
    return 0


def migrate(src: str, dst: str) -> int:
    reader = ProtoStreamReader(src)
    raw_records = list(reader)
    reader.close()
    from cartographer_tpu.io.carto_pbstream import is_carto_stream
    if raw_records and is_carto_stream(raw_records[0]):
        return _migrate_carto(src, dst)
    records = [msgpack.unpackb(r, raw=False) for r in raw_records]
    if not records or records[0].get("type") != "header":
        print("not a cartographer_tpu pbstream", file=sys.stderr)
        return 1
    version = records[0]["format_version"]
    if version == SERIALIZATION_FORMAT_VERSION:
        print("already at current version")
        return 0
    if version == 1:
        records = _migrate_v1(records)
        records[0]["format_version"] = SERIALIZATION_FORMAT_VERSION
    writer = ProtoStreamWriter(dst)
    for r in records:
        writer.write(msgpack.packb(r, use_bin_type=True))
    writer.close()
    print(f"migrated v{version} -> v{SERIALIZATION_FORMAT_VERSION}: {dst}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="pbstream")
    sub = parser.add_subparsers(dest="command", required=True)
    p_info = sub.add_parser("info")
    p_info.add_argument("file")
    p_info.add_argument("--all_debug_strings", action="store_true")
    p_mig = sub.add_parser("migrate")
    p_mig.add_argument("input")
    p_mig.add_argument("output")
    args = parser.parse_args(argv)
    if args.command == "info":
        return info(args.file, args.all_debug_strings)
    return migrate(args.input, args.output)


if __name__ == "__main__":
    sys.exit(main())
