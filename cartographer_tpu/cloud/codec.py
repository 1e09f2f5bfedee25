"""msgpack codec for RPC messages and sensor payloads."""

from __future__ import annotations

from typing import Any

import msgpack
import numpy as np

from cartographer_tpu.sensor.data import (
    FixedFramePoseData,
    ImuData,
    LandmarkData,
    LandmarkObservation,
    OdometryData,
    TimedPointCloudData,
)


def _nd(a) -> dict:
    a = np.ascontiguousarray(a)
    return {"__nd__": True, "shape": list(a.shape), "dtype": str(a.dtype),
            "data": a.tobytes()}


def _un_nd(d) -> np.ndarray:
    return np.frombuffer(d["data"], dtype=np.dtype(d["dtype"])).reshape(d["shape"]).copy()


def encode(obj: Any) -> bytes:
    return msgpack.packb(obj, use_bin_type=True)


def decode(data: bytes) -> Any:
    return msgpack.unpackb(data, raw=False)


def encode_sensor_data(sensor_id: str, data) -> dict:
    if isinstance(data, TimedPointCloudData):
        return {"kind": "rangefinder", "sensor_id": sensor_id, "time": data.time,
                "origin": _nd(data.origin), "ranges": _nd(data.ranges),
                "times": _nd(data.times),
                "intensities": None if data.intensities is None else _nd(data.intensities)}
    if isinstance(data, ImuData):
        return {"kind": "imu", "sensor_id": sensor_id, "time": data.time,
                "linear_acceleration": _nd(data.linear_acceleration),
                "angular_velocity": _nd(data.angular_velocity)}
    if isinstance(data, OdometryData):
        return {"kind": "odometry", "sensor_id": sensor_id, "time": data.time,
                "translation": _nd(data.pose_translation),
                "rotation": _nd(data.pose_rotation)}
    if isinstance(data, FixedFramePoseData):
        return {"kind": "fixed_frame_pose", "sensor_id": sensor_id, "time": data.time,
                "translation": None if data.pose_translation is None else _nd(data.pose_translation),
                "rotation": None if data.pose_rotation is None else _nd(data.pose_rotation)}
    if isinstance(data, LandmarkData):
        return {"kind": "landmark", "sensor_id": sensor_id, "time": data.time,
                "observations": [
                    {"id": o.id,
                     "translation": _nd(o.landmark_to_tracking_transform_translation),
                     "rotation": _nd(o.landmark_to_tracking_transform_rotation),
                     "translation_weight": o.translation_weight,
                     "rotation_weight": o.rotation_weight}
                    for o in data.landmark_observations]}
    from cartographer_tpu.mapping.local_slam_result_data import LocalSlamResultData

    if isinstance(data, LocalSlamResultData):
        return encode_local_slam_result(sensor_id, data)
    raise TypeError(f"cannot encode sensor data {type(data)}")


def encode_local_slam_result(sensor_id: str, data) -> dict:
    """Wire form of LocalSlamResultData (proto::LocalSlamResultData analog:
    cloud/proto/map_builder_service.proto SensorData.local_slam_result_data)."""
    node = {k: (_nd(v) if isinstance(v, np.ndarray) else v)
            for k, v in data.node.items()}
    submaps = []
    for rec in data.submaps:
        d = {"trajectory_id": rec.trajectory_id,
             "submap_index": rec.submap_index,
             "local_pose_translation": _nd(rec.local_pose_translation),
             "local_pose_rotation": _nd(rec.local_pose_rotation),
             "num_range_data": rec.num_range_data,
             "insertion_finished": rec.insertion_finished}
        if rec.grid is not None:
            d["grid"] = rec.grid
        if rec.high_grid is not None:
            d["high_grid"] = rec.high_grid
            d["low_grid"] = rec.low_grid
        if rec.histogram is not None:
            d["histogram"] = _nd(rec.histogram)
        submaps.append(d)
    return {"kind": "local_slam_result", "sensor_id": sensor_id,
            "time": data.time, "node": node, "submaps": submaps,
            "is_3d": data.is_3d}


def _decode_local_slam_result(msg: dict):
    from cartographer_tpu.mapping.local_slam_result_data import (
        LocalSlamResultData,
        SubmapRecord,
    )

    node = {k: (_un_nd(v) if isinstance(v, dict) and v.get("__nd__") else v)
            for k, v in msg["node"].items()}
    submaps = [SubmapRecord(
        trajectory_id=d["trajectory_id"],
        submap_index=d["submap_index"],
        local_pose_translation=_un_nd(d["local_pose_translation"]),
        local_pose_rotation=_un_nd(d["local_pose_rotation"]),
        num_range_data=d["num_range_data"],
        insertion_finished=d["insertion_finished"],
        grid=d.get("grid"),
        high_grid=d.get("high_grid"),
        low_grid=d.get("low_grid"),
        histogram=_un_nd(d["histogram"]) if "histogram" in d else None,
    ) for d in msg["submaps"]]
    return msg["sensor_id"], LocalSlamResultData(
        time=msg["time"], node=node, submaps=submaps, is_3d=msg["is_3d"])


def decode_sensor_data(msg: dict):
    kind = msg["kind"]
    if kind == "rangefinder":
        return msg["sensor_id"], TimedPointCloudData(
            time=msg["time"], origin=_un_nd(msg["origin"]),
            ranges=_un_nd(msg["ranges"]), times=_un_nd(msg["times"]),
            intensities=None if msg["intensities"] is None else _un_nd(msg["intensities"]))
    if kind == "imu":
        return msg["sensor_id"], ImuData(
            time=msg["time"],
            linear_acceleration=_un_nd(msg["linear_acceleration"]),
            angular_velocity=_un_nd(msg["angular_velocity"]))
    if kind == "odometry":
        return msg["sensor_id"], OdometryData(
            time=msg["time"], pose_translation=_un_nd(msg["translation"]),
            pose_rotation=_un_nd(msg["rotation"]))
    if kind == "fixed_frame_pose":
        return msg["sensor_id"], FixedFramePoseData(
            time=msg["time"],
            pose_translation=None if msg["translation"] is None else _un_nd(msg["translation"]),
            pose_rotation=None if msg["rotation"] is None else _un_nd(msg["rotation"]))
    if kind == "landmark":
        return msg["sensor_id"], LandmarkData(
            time=msg["time"],
            landmark_observations=[
                LandmarkObservation(
                    id=o["id"],
                    landmark_to_tracking_transform_translation=_un_nd(o["translation"]),
                    landmark_to_tracking_transform_rotation=_un_nd(o["rotation"]),
                    translation_weight=o["translation_weight"],
                    rotation_weight=o["rotation_weight"])
                for o in msg["observations"]])
    if kind == "local_slam_result":
        return _decode_local_slam_result(msg)
    raise TypeError(f"cannot decode sensor data kind {kind}")
