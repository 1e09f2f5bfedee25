"""Floor detection for multi-storey maps.

Reference: mapping/detect_floors.cc — segment a trajectory into floors by
the z heights of its nodes: z-jumps above a threshold split the trajectory
into spans; spans are clustered by median z and merged into Floor objects
(timespans + height).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from cartographer_tpu.core.time import Time

# detect_floors.cc constants (approximate roles).
_MIN_SIZE = 10  # minimum nodes per span
_MAX_Z_DIFFERENCE = 1.0  # z movement within one floor
_LEVEL_FRACTION = 0.1  # cluster merge threshold on median z


@dataclasses.dataclass
class Timespan:
    start: Time
    end: Time


@dataclasses.dataclass
class Floor:
    timespans: List[Timespan]
    z: float


def detect_floors(times: List[Time], zs: List[float]) -> List[Floor]:
    """Segment (time, z) samples of a trajectory into floors."""
    times = list(times)
    zs = list(zs)
    if not times:
        return []
    # 1. Split into spans where z stays within _MAX_Z_DIFFERENCE of the
    # span's running median.
    spans: List[Tuple[int, int]] = []
    start = 0
    for i in range(1, len(zs)):
        window = zs[start:i]
        med = float(np.median(window))
        if abs(zs[i] - med) > _MAX_Z_DIFFERENCE:
            spans.append((start, i))
            start = i
    spans.append((start, len(zs)))
    # Drop tiny transition spans (stair climbs).
    spans = [s for s in spans if s[1] - s[0] >= _MIN_SIZE] or spans

    # 2. Cluster spans by median z.
    floors: List[Floor] = []
    for s0, s1 in spans:
        med = float(np.median(zs[s0:s1]))
        placed = False
        for floor in floors:
            if abs(floor.z - med) < max(_LEVEL_FRACTION * max(abs(med), 1.0), 0.3):
                floor.timespans.append(Timespan(times[s0], times[s1 - 1]))
                n_old = sum(1 for _ in floor.timespans) - 1
                floor.z = (floor.z * n_old + med) / (n_old + 1)
                placed = True
                break
        if not placed:
            floors.append(Floor(timespans=[Timespan(times[s0], times[s1 - 1])],
                                z=med))
    floors.sort(key=lambda f: f.z)
    return floors
