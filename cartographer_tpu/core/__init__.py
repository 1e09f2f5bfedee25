"""Runtime substrate: time, math, config, sampling, histograms, task DAG.

Equivalent of the reference's `cartographer/common/` (SURVEY.md §2.1).
"""

from cartographer_tpu.core.time import (
    Duration,
    Time,
    from_seconds,
    from_universal,
    to_seconds,
    to_universal,
)
from cartographer_tpu.core.mathutil import (
    clamp,
    normalize_angle_difference,
    power,
    round_to_int,
)
from cartographer_tpu.core.sampler import FixedRatioSampler
from cartographer_tpu.core.histogram import Histogram
