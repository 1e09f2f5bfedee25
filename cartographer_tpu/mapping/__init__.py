"""SLAM core (reference: cartographer/mapping/, SURVEY.md §2.4-2.6).

Host orchestration classes wrapping the device kernels in ops/: local
trajectory builders (frontend), pose graph + constraint builder (backend),
submaps, extrapolation, and the MapBuilder facade.
"""

from cartographer_tpu.mapping.id import MapById, NodeId, SubmapId
from cartographer_tpu.mapping.imu_tracker import ImuTracker
from cartographer_tpu.mapping.pose_extrapolator import PoseExtrapolator
from cartographer_tpu.mapping.motion_filter import MotionFilter
