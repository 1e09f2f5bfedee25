"""ImuBasedPoseExtrapolator: sliding-window optimization extrapolation.

Mirrors the intent of the reference's use (trajectory_builder_3d.lua
pose_extrapolator.use_imu_based): given a pose queue + IMU stream on an
analytically-known trajectory, the extrapolated pose must track ground truth
ahead of the newest scan-match pose.
"""

import numpy as np

from cartographer_tpu.core.config import ImuBasedExtrapolatorOptions
from cartographer_tpu.core.time import from_seconds
from cartographer_tpu.mapping.imu_based_pose_extrapolator import ImuBasedPoseExtrapolator
from cartographer_tpu.sensor.data import ImuData
from cartographer_tpu.transform import nquat

G = 9.806


def _circle_state(t, radius=2.0, omega=0.5):
    """Ground truth on a circle at constant angular rate (yaw-only motion)."""
    pos = np.array([radius * np.cos(omega * t), radius * np.sin(omega * t), 0.0])
    yaw = omega * t + np.pi / 2  # facing velocity
    q = nquat.from_yaw(yaw)
    # specific force in tracking frame: R^T (a_world + g z)
    a_world = -omega * omega * pos
    accel = nquat.rotate(nquat.conjugate(q), a_world + np.array([0.0, 0.0, G]))
    gyro = nquat.rotate(nquat.conjugate(q), np.array([0.0, 0.0, omega]))
    return pos, q, accel, gyro


def _build(duration_s=1.2, pose_hz=10, imu_hz=100):
    opts = ImuBasedExtrapolatorOptions(gravity_constant=G)
    t0, q0, a0, w0 = _circle_state(0.001)
    e = ImuBasedPoseExtrapolator.initialize_with_imu(
        opts, [ImuData(time=from_seconds(0.0), linear_acceleration=a0,
                       angular_velocity=w0)],
        initial_poses=[(from_seconds(0.001), t0, q0)])
    n_imu = int(duration_s * imu_hz)
    n_pose = int(duration_s * pose_hz)
    imu_times = [(i + 1) / imu_hz for i in range(n_imu)]
    pose_times = [(i + 1) / pose_hz for i in range(n_pose)]
    events = sorted([(t, "imu") for t in imu_times] + [(t, "pose") for t in pose_times])
    for t, kind in events:
        pos, q, accel, gyro = _circle_state(t)
        if kind == "imu":
            e.add_imu_data(ImuData(time=from_seconds(t),
                                   linear_acceleration=accel,
                                   angular_velocity=gyro))
        else:
            e.add_pose(from_seconds(t), pos, q)
    return e, pose_times[-1]


def test_extrapolates_ahead_of_pose_queue():
    e, t_last = _build()
    t_query = t_last + 0.1
    (trans, rot) = e.extrapolate_pose(from_seconds(t_query))
    gt_t, gt_q, _, _ = _circle_state(t_query)
    assert np.linalg.norm(trans - gt_t) < 0.02, (trans, gt_t)
    err_q = nquat.multiply(nquat.conjugate(rot), gt_q)
    assert abs(nquat.angle(err_q)) < 0.02


def test_gravity_orientation_is_upright_for_planar_motion():
    e, t_last = _build()
    g_q = e.estimate_gravity_orientation(from_seconds(t_last + 0.05))
    z_in_gravity = nquat.rotate(g_q, np.array([0.0, 0.0, 1.0]))
    assert np.dot(z_in_gravity, [0.0, 0.0, 1.0]) > 0.999


def test_short_queue_returns_newest_pose():
    opts = ImuBasedExtrapolatorOptions(gravity_constant=G)
    t0, q0, a0, w0 = _circle_state(0.0)
    e = ImuBasedPoseExtrapolator.initialize_with_imu(
        opts, [ImuData(time=from_seconds(0.0), linear_acceleration=a0,
                       angular_velocity=w0)],
        initial_poses=[(from_seconds(0.001), t0, q0)])
    trans, rot = e.extrapolate_pose(from_seconds(0.5))
    np.testing.assert_allclose(trans, t0)


def test_batched_times_are_monotone_interpolants():
    e, t_last = _build()
    times = [from_seconds(t_last + dt) for dt in (0.02, 0.05, 0.08, 0.1)]
    poses, velocity, gravity = e.extrapolate_poses_with_gravity(times)
    assert len(poses) == 4
    # speed on the circle is omega*r = 1.0 m/s
    assert abs(np.linalg.norm(velocity) - 1.0) < 0.1
    ds = [np.linalg.norm(poses[i + 1][0] - poses[i][0]) for i in range(3)]
    assert all(d > 0 for d in ds)


def test_local_slam_3d_with_imu_based_extrapolator():
    """End-to-end: LocalTrajectoryBuilder3D tracks with use_imu_based=true
    (pose_extrapolator dispatch, pose_extrapolator_interface.cc:62-76)."""
    from cartographer_tpu.mapping.local_trajectory_builder_3d import LocalTrajectoryBuilder3D
    from test_local_slam_3d import small_options_3d, drive_3d
    from test_ops_3d import make_environment_3d

    opts = small_options_3d(**{"pose_extrapolator.use_imu_based": True,
                               "pose_extrapolator.imu_based.pose_queue_duration": 1.0})
    world = make_environment_3d(num=500, seed=1)
    builder = LocalTrajectoryBuilder3D(opts, ["points"])
    poses = [(np.array([0.04 * i, 0.0, 0.0]), 0.0) for i in range(12)]
    results = drive_3d(builder, world, poses)
    assert len(results) >= 11
    final = results[-1].local_pose_translation
    expected = np.array([0.04 * (len(results) - 1), 0.0, 0.0])
    assert np.linalg.norm(final - expected) < 0.15, (final, expected)
