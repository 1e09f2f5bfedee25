"""Timestamped pose interpolation.

Equivalent of `cartographer/transform/timestamped_transform.{h,cc}` and
`transform_interpolation_buffer.{h,cc}`: linear interpolation on translation,
slerp on rotation; a sorted host-side buffer with `lookup(time)` used by
ground-truth tooling and pure localization.
"""

from __future__ import annotations

import bisect
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from cartographer_tpu.core.time import Time
from cartographer_tpu.transform import quaternion as quat
from cartographer_tpu.transform.rigid import Rigid3


def interpolate_rigid3(start: Rigid3, end: Rigid3, factor) -> Rigid3:
    """Interpolate between two poses with factor in [0, 1] (device-safe)."""
    factor = jnp.asarray(factor)
    t = start.translation + factor[..., None] * (end.translation - start.translation)
    q = quat.slerp(start.rotation, end.rotation, factor)
    return Rigid3(t, q)


def _np_interpolate(start_t: np.ndarray, start_q: np.ndarray,
                    end_t: np.ndarray, end_q: np.ndarray, factor: float
                    ) -> Tuple[np.ndarray, np.ndarray]:
    t = start_t + factor * (end_t - start_t)
    if np.dot(start_q, end_q) < 0:
        end_q = -end_q
    d = np.clip(abs(float(np.dot(start_q, end_q))), -1.0, 1.0)
    theta = np.arccos(d)
    if np.sin(theta) < 1e-6:
        q = (1 - factor) * start_q + factor * end_q
    else:
        q = (np.sin((1 - factor) * theta) * start_q + np.sin(factor * theta) * end_q) / np.sin(theta)
    return t, q / np.linalg.norm(q)


class TransformInterpolationBuffer:
    """Sorted (time, pose) buffer with interpolating lookup; host-side (numpy).

    Mirrors transform::TransformInterpolationBuffer
    (cartographer/transform/transform_interpolation_buffer.cc).
    """

    UNLIMITED = 0

    def __init__(self, buffer_size_limit: int = UNLIMITED):
        self._times: List[Time] = []
        self._translations: List[np.ndarray] = []
        self._rotations: List[np.ndarray] = []
        self._limit = buffer_size_limit

    def push(self, time: Time, translation, rotation_quat) -> None:
        if self._times and time < self._times[-1]:
            # Only newer transforms may be pushed (reference CHECKs this).
            raise ValueError("pushed transform is older than newest in buffer")
        self._times.append(time)
        self._translations.append(np.asarray(translation, np.float64))
        self._rotations.append(np.asarray(rotation_quat, np.float64))
        if self._limit != self.UNLIMITED and len(self._times) > self._limit:
            self._times.pop(0)
            self._translations.pop(0)
            self._rotations.pop(0)

    def push_rigid3(self, time: Time, pose: Rigid3) -> None:
        self.push(time, np.asarray(pose.translation), np.asarray(pose.rotation))

    def has(self, time: Time) -> bool:
        return bool(self._times) and self._times[0] <= time <= self._times[-1]

    @property
    def size(self) -> int:
        return len(self._times)

    @property
    def earliest_time(self) -> Time:
        return self._times[0]

    @property
    def latest_time(self) -> Time:
        return self._times[-1]

    def lookup(self, time: Time) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (translation (3,), quaternion (4,)) interpolated at `time`."""
        if not self.has(time):
            raise KeyError(f"missing transform for time {time}")
        i = bisect.bisect_left(self._times, time)
        if self._times[i] == time:
            return self._translations[i], self._rotations[i]
        t0, t1 = self._times[i - 1], self._times[i]
        factor = (time - t0) / (t1 - t0)
        return _np_interpolate(
            self._translations[i - 1], self._rotations[i - 1],
            self._translations[i], self._rotations[i], factor,
        )
