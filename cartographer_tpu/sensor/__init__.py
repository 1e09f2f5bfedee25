"""Sensor data model & queueing (reference: cartographer/sensor/, SURVEY.md §2.3).

Device-facing containers (PointCloud, RangeData) are fixed-capacity padded
arrays with validity masks — XLA needs static shapes, so this replaces the
reference's dynamic std::vector clouds. Host-facing sample types (IMU,
odometry, ...) are plain dataclasses flowing through the collator queues.
"""

from cartographer_tpu.sensor.point_cloud import (
    PointCloud,
    RangeData,
    TimedPointCloud,
)
from cartographer_tpu.sensor.data import (
    FixedFramePoseData,
    ImuData,
    LandmarkData,
    LandmarkObservation,
    OdometryData,
    TimedPointCloudData,
)
from cartographer_tpu.sensor.voxel_filter import (
    adaptive_voxel_filter,
    voxel_filter,
    voxel_filter_edge,
)
from cartographer_tpu.sensor.collator import (
    Collator,
    OrderedMultiQueue,
    QueueKey,
    TrajectoryCollator,
)
