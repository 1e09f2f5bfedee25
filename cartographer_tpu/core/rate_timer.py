"""Event-rate measurement (reference: common/internal/rate_timer.h)."""

from __future__ import annotations

import time
from collections import deque
from typing import Deque, Optional

from cartographer_tpu.core.time import Time, to_seconds


class RateTimer:
    """Computes the rate of pulsed events over a sliding window, both in
    event time and wall time."""

    def __init__(self, window_duration_seconds: float = 15.0):
        self._window = window_duration_seconds
        self._events: Deque = deque()  # (event_time_us, wall_time_s)

    def pulse(self, event_time: Time) -> None:
        now = time.monotonic()
        self._events.append((event_time, now))
        while (len(self._events) > 2
               and now - self._events[0][1] > self._window):
            self._events.popleft()

    def compute_rate(self) -> float:
        """Events per second in event time; 0 with fewer than 2 events."""
        if len(self._events) < 2:
            return 0.0
        dt = to_seconds(self._events[-1][0] - self._events[0][0])
        return (len(self._events) - 1) / dt if dt > 0 else 0.0

    def compute_wall_time_rate_ratio(self) -> float:
        """Event-time progress per wall-time second (the real-time ratio)."""
        if len(self._events) < 2:
            return 0.0
        event_dt = to_seconds(self._events[-1][0] - self._events[0][0])
        wall_dt = self._events[-1][1] - self._events[0][1]
        return event_dt / wall_dt if wall_dt > 0 else 0.0
