"""Versioned, ordered SLAM-state serialization into pbstream.

Reference: cartographer/io/internal/mapping_state_serialization.cc — the
stream order is SerializationHeader{format_version} -> PoseGraph ->
AllTrajectoryBuilderOptions -> Submap* -> Node* -> TrajectoryData -> sensor
data. This module keeps the same record order and versioning (version 2;
a v1->v2 migration hook mirrors io/serialization_format_migration.cc), with
msgpack payloads. Node clouds are stored quantized to int16 at millimeter
resolution — the counterpart of the reference's CompressedPointCloud
(sensor/compressed_point_cloud.cc, ~1/3 byte-per-dim block compression).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import msgpack
import numpy as np

from cartographer_tpu.io.pbstream import ProtoStreamReader, ProtoStreamWriter
from cartographer_tpu.mapping.constraint_builder_2d import Constraint
from cartographer_tpu.mapping.id import NodeId, SubmapId
from cartographer_tpu.mapping.pose_graph_2d import (
    PoseGraph2D,
    SubmapDataEntry,
    TrajectoryNode,
)
from cartographer_tpu.mapping.submap_2d import Submap2D
from cartographer_tpu.ops.grid_2d import Grid2D

SERIALIZATION_FORMAT_VERSION = 2
_CLOUD_QUANT = 1000.0  # mm quantization for node clouds


def _nd(a: np.ndarray) -> Dict[str, Any]:
    a = np.ascontiguousarray(a)
    return {"__nd__": True, "shape": list(a.shape), "dtype": str(a.dtype),
            "data": a.tobytes()}


def _un_nd(d) -> np.ndarray:
    return np.frombuffer(d["data"], dtype=np.dtype(d["dtype"])).reshape(d["shape"]).copy()


def _pack(obj) -> bytes:
    return msgpack.packb(obj, use_bin_type=True)


def _unpack(data: bytes):
    return msgpack.unpackb(data, raw=False)


def _quantize_cloud(points: np.ndarray) -> Dict[str, Any]:
    q = np.clip(np.round(points * _CLOUD_QUANT), -32767, 32767).astype(np.int16)
    return _nd(q)


def _dequantize_cloud(d) -> np.ndarray:
    return _un_nd(d).astype(np.float64) / _CLOUD_QUANT


def serialize_state(pose_graph: PoseGraph2D, writer: ProtoStreamWriter,
                    include_unfinished_submaps: bool = True) -> None:
    """WritePbStream equivalent (mapping_state_serialization.cc:31-36)."""
    writer.write(_pack({"type": "header",
                        "format_version": SERIALIZATION_FORMAT_VERSION}))

    # PoseGraph record: global poses + constraints.
    constraints = [{
        "submap_id": [c.submap_id.trajectory_id, c.submap_id.submap_index],
        "node_id": [c.node_id.trajectory_id, c.node_id.node_index],
        "rel": list(map(float, c.rel)),
        "translation_weight": c.translation_weight,
        "rotation_weight": c.rotation_weight,
        "tag": c.tag,
    } for c in pose_graph.constraints]
    writer.write(_pack({
        "type": "pose_graph",
        "constraints": constraints,
        "submap_poses": [
            {"id": [t, i], "pose": list(map(float, e.global_pose_2d))}
            for (t, i), e in pose_graph.submap_data.items()],
        "node_poses": [
            {"id": [t, i], "pose": list(map(float, n.global_pose_2d))}
            for (t, i), n in pose_graph.nodes.items()],
    }))

    writer.write(_pack({"type": "trajectory_builder_options", "options": {}}))

    for (t, i), entry in pose_graph.submap_data.items():
        submap = entry.submap
        if submap.grid is None and not include_unfinished_submaps:
            continue
        record = {
            "type": "submap",
            "id": [t, i],
            "num_range_data": submap.num_range_data,
            "finished": submap.insertion_finished,
            "local_pose_translation": list(map(float, submap.local_pose_translation)),
            "local_pose_rotation": list(map(float, submap.local_pose_rotation)),
        }
        if submap.grid is not None:
            grid = submap.grid
            record["grid"] = {
                "log_odds": _nd(np.asarray(grid.log_odds, np.float16)),
                "known": _nd(np.packbits(np.asarray(grid.known))),
                "known_shape": list(np.asarray(grid.known).shape),
                "origin": list(map(float, np.asarray(grid.origin))),
                "resolution": grid.resolution,
            }
        writer.write(_pack(record))

    for (t, i), node in pose_graph.nodes.items():
        writer.write(_pack({
            "type": "node",
            "id": [t, i],
            "time": node.time,
            "gravity_alignment": list(map(float, node.gravity_alignment)),
            "local_pose_translation": list(map(float, node.local_pose_translation)),
            "local_pose_rotation": list(map(float, node.local_pose_rotation)),
            "cloud": _quantize_cloud(node.filtered_points),
        }))

    writer.write(_pack({"type": "trajectory_data"}))


def _migrate_v1(records: List[dict]) -> List[dict]:
    """v1 -> v2 migration hook (serialization_format_migration.cc): v1 lacked
    per-submap finished flags; default them."""
    for r in records:
        if r.get("type") == "submap":
            r.setdefault("finished", True)
    return records


def load_state(reader: ProtoStreamReader, pose_graph: PoseGraph2D,
               trajectory_remapping: Optional[Dict[int, int]] = None,
               frozen: bool = False) -> Dict[int, int]:
    """MapBuilder::LoadState equivalent (map_builder.cc:227-395): stream in
    submaps/nodes/constraints, remapping trajectory ids; optionally freeze.

    Returns the trajectory id remapping used.
    """
    records = [_unpack(r) for r in reader]
    if not records or records[0].get("type") != "header":
        raise ValueError("missing serialization header")
    version = records[0]["format_version"]
    if version == 1:
        records = _migrate_v1(records)
    elif version != SERIALIZATION_FORMAT_VERSION:
        raise ValueError(f"unsupported format version {version}")

    remap: Dict[int, int] = dict(trajectory_remapping or {})
    used = set(pose_graph.nodes.trajectory_ids()) | set(
        pose_graph.submap_data.trajectory_ids())
    next_id = (max(used) + 1) if used else 0

    def map_traj(t: int) -> int:
        nonlocal next_id
        if t not in remap:
            remap[t] = next_id
            next_id += 1
        return remap[t]

    pose_graph_record = next(r for r in records if r["type"] == "pose_graph")
    submap_poses = {tuple(e["id"]): np.asarray(e["pose"])
                    for e in pose_graph_record["submap_poses"]}
    node_poses = {tuple(e["id"]): np.asarray(e["pose"])
                  for e in pose_graph_record["node_poses"]}

    for r in records:
        if r["type"] == "submap":
            t, i = r["id"]
            nt = map_traj(t)
            grid = None
            if "grid" in r:
                g = r["grid"]
                import jax.numpy as jnp
                known = np.unpackbits(_un_nd(g["known"]))[
                    : int(np.prod(g["known_shape"]))].reshape(g["known_shape"]).astype(bool)
                grid = Grid2D(
                    log_odds=jnp.asarray(_un_nd(g["log_odds"]).astype(np.float32)),
                    known=jnp.asarray(known),
                    origin=jnp.asarray(g["origin"], jnp.float32),
                    resolution=g["resolution"])
            submap = Submap2D(
                local_pose_translation=np.asarray(r["local_pose_translation"]),
                local_pose_rotation=np.asarray(r["local_pose_rotation"]),
                num_range_data=r["num_range_data"],
                insertion_finished=r["finished"],
                grid=grid)
            entry = SubmapDataEntry(
                submap=submap,
                global_pose_2d=submap_poses[(t, i)],
                finished=r["finished"],
                frozen=frozen)
            pose_graph.submap_data.insert(SubmapId(nt, i), entry)
        elif r["type"] == "node":
            t, i = r["id"]
            nt = map_traj(t)
            node = TrajectoryNode(
                time=r["time"],
                gravity_alignment=np.asarray(r["gravity_alignment"]),
                filtered_points=_dequantize_cloud(r["cloud"]),
                local_pose_translation=np.asarray(r["local_pose_translation"]),
                local_pose_rotation=np.asarray(r["local_pose_rotation"]),
                global_pose_2d=node_poses[(t, i)])
            pose_graph.nodes.insert(NodeId(nt, i), node)

    for c in pose_graph_record["constraints"]:
        st, si = c["submap_id"]
        nt, ni = c["node_id"]
        if frozen and c["tag"] == "INTER_SUBMAP":
            pass  # constraints between frozen elements are kept as-is
        pose_graph.constraints.append(Constraint(
            submap_id=SubmapId(map_traj(st), si),
            node_id=NodeId(map_traj(nt), ni),
            rel=np.asarray(c["rel"]),
            translation_weight=c["translation_weight"],
            rotation_weight=c["rotation_weight"],
            tag=c["tag"]))

    if frozen:
        for t in set(remap.values()):
            pose_graph.freeze_trajectory(t)
    return remap
