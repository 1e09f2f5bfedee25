"""Odometry pose interpolation in the 2D SPA (optimization_problem_2d.cc
CalculateOdometryBetweenNodes): yaw must interpolate along the SHORTEST
arc. Regression for the r5 root-cause found by the official-pbstream
replay eval: linear yaw interpolation across the +-pi seam produced a
~pi-wrong odometry pose whose high-weight residual dragged the solve
meters off."""

import numpy as np

from cartographer_tpu.core.config import PoseGraphOptions
from cartographer_tpu.mapping.pose_graph_2d import PoseGraph2D
from cartographer_tpu.sensor.data import OdometryData
from cartographer_tpu.transform import nquat


def _push(pg, t, x, y, yaw):
    pg.add_odometry_data(0, OdometryData(
        time=t, pose_translation=np.array([x, y, 0.0]),
        pose_rotation=nquat.from_yaw(yaw)))


def test_yaw_interpolates_across_pi_seam():
    pg = PoseGraph2D(PoseGraphOptions())
    # Robot turning through the seam: +3.10 -> -3.10 is a +0.0832 rad turn,
    # NOT a -6.2 rad one.
    _push(pg, 1_000_000, 0.0, 0.0, 3.10)
    _push(pg, 1_100_000, 0.1, 0.0, -3.10)
    (mid,) = pg._odometry_poses_at(0, [1_050_000])
    assert mid is not None
    # Midpoint yaw must sit near the seam (magnitude ~pi), not near 0.
    assert abs(abs(mid[2]) - np.pi) < 0.05, mid
    np.testing.assert_allclose(mid[:2], [0.05, 0.0], atol=1e-6)


def test_yaw_interpolates_normally_off_seam():
    pg = PoseGraph2D(PoseGraphOptions())
    _push(pg, 1_000_000, 0.0, 0.0, 0.50)
    _push(pg, 1_100_000, 0.2, 0.1, 0.70)
    (mid,) = pg._odometry_poses_at(0, [1_050_000])
    np.testing.assert_allclose(mid, [0.1, 0.05, 0.60], atol=1e-6)
