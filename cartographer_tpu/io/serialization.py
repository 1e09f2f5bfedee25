"""Versioned, ordered SLAM-state serialization into pbstream.

Reference: cartographer/io/internal/mapping_state_serialization.cc — the
stream order is SerializationHeader{format_version} -> PoseGraph ->
AllTrajectoryBuilderOptions -> Submap* -> Node* -> TrajectoryData -> sensor
data. This module keeps the same record order and versioning (version 2;
a v1->v2 migration hook mirrors io/serialization_format_migration.cc), with
msgpack payloads. Node clouds are stored via sensor.compression
CompressedPointCloud (block keys + uint8 offsets at 1 mm precision), the
counterpart of the reference's CompressedPointCloud
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
_CLOUD_QUANT = 1000.0  # legacy mm quantization (v2 streams written by round 1)


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
    """Block-compress a node cloud (sensor/compressed_point_cloud.cc analog)."""
    from cartographer_tpu.sensor.compression import compress_cloud

    return compress_cloud(np.asarray(points, np.float64))


def _dequantize_cloud(d) -> np.ndarray:
    from cartographer_tpu.sensor.compression import decompress_cloud

    if isinstance(d, dict) and d.get("__nd__"):  # legacy int16 mm payloads
        return _un_nd(d).astype(np.float64) / _CLOUD_QUANT
    return decompress_cloud(d)


def serialize_state(pose_graph, writer: ProtoStreamWriter,
                    include_unfinished_submaps: bool = True) -> None:
    """WritePbStream equivalent (mapping_state_serialization.cc:31-36).

    Dispatches on the pose graph type (2D / 3D)."""
    from cartographer_tpu.mapping.pose_graph_3d import PoseGraph3D

    if isinstance(pose_graph, PoseGraph3D):
        return _serialize_state_3d(pose_graph, writer, include_unfinished_submaps)
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
        # PoseGraph proto landmark_poses (pose_graph.proto:LandmarkPose).
        "landmark_poses": {
            lid: list(map(float, np.atleast_1d(p)))
            for lid, p in pose_graph.landmark_poses.items()},
        "frozen_landmarks": sorted(pose_graph._frozen_landmarks),
        # Learned fixed-frame origins (optimization_problem TrajectoryData
        # fixed_frame_origin_in_map, 2D projection).
        "fixed_frame_origins": {
            str(tid): list(map(float, o))
            for tid, o in pose_graph.fixed_frame_origin.items()},
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
            record["grid"] = grid2d_record(submap.grid)
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


def grid2d_record(grid) -> Dict[str, Any]:
    """Serialization-format dict for a 2D grid (f16 log-odds + packed known)."""
    return {
        "log_odds": _nd(np.asarray(grid.log_odds, np.float16)),
        "known": _nd(np.packbits(np.asarray(grid.known))),
        "known_shape": list(np.asarray(grid.known).shape),
        "origin": list(map(float, np.asarray(grid.origin))),
        "resolution": grid.resolution,
    }


def un_grid2d(g) -> Grid2D:
    import jax.numpy as jnp

    known = np.unpackbits(_un_nd(g["known"]))[
        : int(np.prod(g["known_shape"]))].reshape(g["known_shape"]).astype(bool)
    return Grid2D(
        log_odds=jnp.asarray(_un_nd(g["log_odds"]).astype(np.float32)),
        known=jnp.asarray(known),
        origin=jnp.asarray(g["origin"], jnp.float32),
        resolution=g["resolution"])


def _grid3d_record(grid) -> Dict[str, Any]:
    return {
        "log_odds": _nd(np.asarray(grid.log_odds, np.float16)),
        "known": _nd(np.packbits(np.asarray(grid.known))),
        "shape": list(np.asarray(grid.known).shape),
        "origin": list(map(float, np.asarray(grid.origin))),
        "resolution": grid.resolution,
    }


def _un_grid3d(g):
    import jax.numpy as jnp

    from cartographer_tpu.ops.grid_3d import Grid3D

    known = np.unpackbits(_un_nd(g["known"]))[: int(np.prod(g["shape"]))].reshape(
        g["shape"]).astype(bool)
    return Grid3D(
        log_odds=jnp.asarray(_un_nd(g["log_odds"]).astype(np.float32)),
        known=jnp.asarray(known),
        origin=jnp.asarray(g["origin"], jnp.float32),
        resolution=g["resolution"])


def _intensity3d_record(grid) -> Dict[str, Any]:
    """Sparse record of an IntensityGrid3D dense crop: flat indices of the
    populated voxels + their sums/counts. The reference has no serialized
    analog — it FORGETS intensity grids on submap retirement
    (submap_3d.cc:400-404); keeping them is a capability extension."""
    sums = np.asarray(grid.sums, np.float32)
    counts = np.asarray(grid.counts, np.float32)
    idx = np.flatnonzero(counts.reshape(-1) > 0)
    return {
        "shape": list(sums.shape),
        "idx": _nd(idx.astype(np.int64)),
        "sums": _nd(sums.reshape(-1)[idx]),
        "counts": _nd(counts.reshape(-1)[idx].astype(np.uint16)),
        "origin": list(map(float, np.asarray(grid.origin))),
        "resolution": grid.resolution,
    }


def _un_intensity3d(g):
    import jax.numpy as jnp

    from cartographer_tpu.ops.grid_3d import IntensityGrid3D

    shape = tuple(g["shape"])
    sums = np.zeros(int(np.prod(shape)), np.float32)
    counts = np.zeros(int(np.prod(shape)), np.float32)
    idx = _un_nd(g["idx"])
    sums[idx] = _un_nd(g["sums"])
    counts[idx] = _un_nd(g["counts"]).astype(np.float32)
    return IntensityGrid3D(
        sums=jnp.asarray(sums.reshape(shape)),
        counts=jnp.asarray(counts.reshape(shape)),
        origin=jnp.asarray(g["origin"], jnp.float32),
        resolution=g["resolution"])


def _serialize_state_3d(pose_graph, writer: ProtoStreamWriter,
                        include_unfinished_submaps: bool = True) -> None:
    writer.write(_pack({"type": "header", "dim": 3,
                        "format_version": SERIALIZATION_FORMAT_VERSION}))
    writer.write(_pack({
        "type": "pose_graph",
        "constraints": [{
            "submap_id": [c.submap_id.trajectory_id, c.submap_id.submap_index],
            "node_id": [c.node_id.trajectory_id, c.node_id.node_index],
            "rel_t": list(map(float, c.rel_t)),
            "rel_q": list(map(float, c.rel_q)),
            "translation_weight": c.translation_weight,
            "rotation_weight": c.rotation_weight,
            "tag": c.tag,
        } for c in pose_graph.constraints],
        "submap_poses": [
            {"id": [t, i], "t": list(map(float, e.global_t)),
             "q": list(map(float, e.global_q))}
            for (t, i), e in pose_graph.submap_data.items()],
        "node_poses": [
            {"id": [t, i], "t": list(map(float, n.global_t)),
             "q": list(map(float, n.global_q))}
            for (t, i), n in pose_graph.nodes.items()],
        "landmark_poses": {
            lid: list(map(float, np.atleast_1d(p)))
            for lid, p in pose_graph.landmark_poses.items()},
        "frozen_landmarks": sorted(pose_graph._frozen_landmarks),
    }))
    writer.write(_pack({"type": "trajectory_builder_options", "options": {}}))
    for (t, i), entry in pose_graph.submap_data.items():
        submap = entry.submap
        if submap.high_grid is None and not include_unfinished_submaps:
            continue
        record = {
            "type": "submap3d", "id": [t, i],
            "num_range_data": submap.num_range_data,
            "finished": submap.insertion_finished,
            "local_pose_translation": list(map(float, submap.local_pose_translation)),
            "local_pose_rotation": list(map(float, submap.local_pose_rotation)),
        }
        if submap.high_grid is not None:
            record["high_grid"] = _grid3d_record(submap.high_grid)
            record["low_grid"] = _grid3d_record(submap.low_grid)
            record["histogram"] = _nd(np.asarray(submap.histogram, np.float32))
            if getattr(submap, "intensity_grid", None) is not None:
                record["intensity_grid"] = _intensity3d_record(
                    submap.intensity_grid)
        writer.write(_pack(record))
    for (t, i), node in pose_graph.nodes.items():
        writer.write(_pack({
            "type": "node3d", "id": [t, i], "time": node.time,
            "gravity_alignment": list(map(float, node.gravity_alignment)),
            "local_pose_translation": list(map(float, node.local_pose_translation)),
            "local_pose_rotation": list(map(float, node.local_pose_rotation)),
            "high_cloud": _quantize_cloud(node.high_res_cloud),
            "low_cloud": _quantize_cloud(node.low_res_cloud),
            "histogram": _nd(np.asarray(node.scan_histogram, np.float32)),
        }))
    # TrajectoryData (optimization_problem_3d.h): learned gravity constant,
    # IMU calibration, fixed-frame origin (serialized per trajectory like
    # mapping_state_serialization.cc SerializeTrajectoryData).
    entries = []
    for tid, td in pose_graph.trajectory_data.items():
        e = {"trajectory_id": tid}
        if "gravity_constant" in td:
            e["gravity_constant"] = float(td["gravity_constant"])
            e["imu_calibration"] = list(map(float, td["imu_calibration"]))
        if "fixed_frame_origin" in td:
            o_t, o_q = td["fixed_frame_origin"]
            e["fixed_frame_origin_t"] = list(map(float, o_t))
            e["fixed_frame_origin_q"] = list(map(float, o_q))
        entries.append(e)
    writer.write(_pack({"type": "trajectory_data", "entries": entries}))


def _load_state_3d(records, pose_graph, trajectory_remapping, frozen):
    from cartographer_tpu.mapping.pose_graph_3d import (
        Constraint3D,
        SubmapDataEntry3D,
        TrajectoryNode3D,
    )
    from cartographer_tpu.mapping.submap_3d import Submap3D

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

    pg_record = next(r for r in records if r["type"] == "pose_graph")
    submap_poses = {tuple(e["id"]): e for e in pg_record["submap_poses"]}
    node_poses = {tuple(e["id"]): e for e in pg_record["node_poses"]}

    for r in records:
        if r["type"] == "submap3d":
            t, i = r["id"]
            nt = map_traj(t)
            submap = Submap3D(
                local_pose_translation=np.asarray(r["local_pose_translation"]),
                local_pose_rotation=np.asarray(r["local_pose_rotation"]),
                num_range_data=r["num_range_data"],
                insertion_finished=r["finished"],
                high_grid=_un_grid3d(r["high_grid"]) if "high_grid" in r else None,
                low_grid=_un_grid3d(r["low_grid"]) if "low_grid" in r else None,
                histogram=_un_nd(r["histogram"]) if "histogram" in r else None)
            if "intensity_grid" in r:
                submap.intensity_grid = _un_intensity3d(r["intensity_grid"])
            sp = submap_poses[(t, i)]
            pose_graph.submap_data.insert(SubmapId(nt, i), SubmapDataEntry3D(
                submap=submap, global_t=np.asarray(sp["t"]),
                global_q=np.asarray(sp["q"]), finished=r["finished"]))
        elif r["type"] == "node3d":
            t, i = r["id"]
            nt = map_traj(t)
            npose = node_poses[(t, i)]
            pose_graph.nodes.insert(NodeId(nt, i), TrajectoryNode3D(
                time=r["time"],
                gravity_alignment=np.asarray(r["gravity_alignment"]),
                high_res_cloud=_dequantize_cloud(r["high_cloud"]),
                low_res_cloud=_dequantize_cloud(r["low_cloud"]),
                scan_histogram=_un_nd(r["histogram"]),
                local_pose_translation=np.asarray(r["local_pose_translation"]),
                local_pose_rotation=np.asarray(r["local_pose_rotation"]),
                global_t=np.asarray(npose["t"]),
                global_q=np.asarray(npose["q"])))
    for c in pg_record["constraints"]:
        st, si = c["submap_id"]
        nt, ni = c["node_id"]
        pose_graph.constraints.append(Constraint3D(
            submap_id=SubmapId(map_traj(st), si),
            node_id=NodeId(map_traj(nt), ni),
            rel_t=np.asarray(c["rel_t"]), rel_q=np.asarray(c["rel_q"]),
            translation_weight=c["translation_weight"],
            rotation_weight=c["rotation_weight"], tag=c["tag"]))
    for c in pose_graph.constraints:
        if c.tag == "INTRA_SUBMAP":
            entry = pose_graph.submap_data.get(c.submap_id)
            if entry is not None:
                entry.node_ids.add(c.node_id)
    for lid, p in pg_record.get("landmark_poses", {}).items():
        pose_graph.landmark_poses[lid] = np.asarray(p, np.float64)
    pose_graph._frozen_landmarks.update(pg_record.get("frozen_landmarks", []))
    td_record = next(
        (r for r in records if r["type"] == "trajectory_data"), None)
    if td_record is not None:
        for e in td_record.get("entries", []):
            entry = {}
            if "gravity_constant" in e:
                entry["gravity_constant"] = e["gravity_constant"]
                entry["imu_calibration"] = np.asarray(e["imu_calibration"])
            if "fixed_frame_origin_t" in e:
                entry["fixed_frame_origin"] = (
                    np.asarray(e["fixed_frame_origin_t"]),
                    np.asarray(e["fixed_frame_origin_q"]))
            if entry:
                pose_graph.trajectory_data[
                    map_traj(e.get("trajectory_id", 0))] = entry
    if frozen:
        for t in set(remap.values()):
            pose_graph.freeze_trajectory(t)
    return remap


def _migrate_v1(records: List[dict]) -> List[dict]:
    """v1 -> v2 migration hook (serialization_format_migration.cc): v1 lacked
    per-submap finished flags; default them."""
    for r in records:
        if r.get("type") == "submap":
            r.setdefault("finished", True)
    return records


def load_state(reader: ProtoStreamReader, pose_graph,
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
    if records[0].get("dim") == 3:
        return _load_state_3d(records, pose_graph, trajectory_remapping, frozen)

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
            grid = un_grid2d(r["grid"]) if "grid" in r else None
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

    # Rebuild submap->node membership from INTRA constraints
    # (map_builder.cc LoadState AddNodeToSubmap, :371-392).
    for c in pose_graph.constraints:
        if c.tag == "INTRA_SUBMAP":
            entry = pose_graph.submap_data.get(c.submap_id)
            if entry is not None:
                entry.node_ids.add(c.node_id)

    for lid, p in pose_graph_record.get("landmark_poses", {}).items():
        pose_graph.landmark_poses[lid] = np.asarray(p, np.float64)
    pose_graph._frozen_landmarks.update(
        pose_graph_record.get("frozen_landmarks", []))
    for tid_s, o in pose_graph_record.get("fixed_frame_origins", {}).items():
        pose_graph.fixed_frame_origin[map_traj(int(tid_s))] = np.asarray(
            o, np.float64)

    if frozen:
        for t in set(remap.values()):
            pose_graph.freeze_trajectory(t)
    return remap
