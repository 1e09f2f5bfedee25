"""3D IMU residual tests (reference: optimization_problem_3d.cc
RotationCostFunction3D / AccelerationCostFunction3D)."""

import jax.numpy as jnp
import numpy as np

from cartographer_tpu.ops.spa_3d import (
    SpaProblem3D,
    acceleration_residual_3d,
    solve_spa_3d,
)
from cartographer_tpu.transform import quaternion as quat


class TestAccelerationResidual:
    def test_zero_for_stationary(self):
        # Stationary robot, level: second_diff = 0; the accelerometer
        # measures +g z over the averaged interval.
        dt = 0.1
        dv = jnp.array([0.0, 0.0, 9.806 * dt])
        r = acceleration_residual_3d(
            jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), quat.identity(),
            dv, dt, dt, 1.0)
        np.testing.assert_allclose(np.asarray(r), 0, atol=1e-5)

    def test_zero_for_constant_acceleration(self):
        # Accelerating at 1 m/s^2 in x: positions 0, 0.005, 0.02 at dt=0.1.
        dt = 0.1
        ti = jnp.array([0.0, 0, 0])
        tj = jnp.array([0.005, 0, 0])
        tk = jnp.array([0.02, 0, 0])
        dv = jnp.array([1.0 * dt, 0.0, 9.806 * dt])
        r = acceleration_residual_3d(ti, tj, tk, quat.identity(), dv, dt, dt, 1.0)
        np.testing.assert_allclose(np.asarray(r), 0, atol=1e-4)

    def test_detects_wrong_motion(self):
        dt = 0.1
        dv = jnp.array([0.0, 0.0, 9.806 * dt])  # stationary measurement
        r = acceleration_residual_3d(
            jnp.zeros(3), jnp.array([0.5, 0, 0]), jnp.array([1.5, 0, 0]),
            quat.identity(), dv, dt, dt, 1.0)
        assert float(jnp.linalg.norm(r)) > 1.0


class TestSolveWithAcceleration:
    def test_triplet_constrains_middle_node(self):
        # Three nodes on a line; the middle node's initial guess is off; a
        # stationary-free-motion IMU triplet (constant velocity) pulls it to
        # the midpoint.
        dt = 0.5
        gt = np.array([[0.0, 0, 0], [0.5, 0, 0], [1.0, 0, 0]])
        init = gt.copy()
        init[1] = [0.8, 0.2, -0.1]
        qs = np.tile(np.array([1.0, 0, 0, 0]), (3, 1))
        # Constant velocity: delta_v measures only gravity.
        dv = np.array([0.0, 0.0, 9.806 * dt])
        # Rotation-only pair constraints pin the node orientations (as the
        # local-SLAM constraints do in the full graph) so the acceleration
        # triplet determines the translation alone.
        problem = SpaProblem3D(
            translations=jnp.asarray(init, jnp.float32),
            rotations=jnp.asarray(qs, jnp.float32),
            a_idx=jnp.asarray([0, 0, 1], jnp.int32),
            b_idx=jnp.asarray([2, 1, 2], jnp.int32),
            rel_t=jnp.asarray([[1.0, 0, 0], [0, 0, 0], [0, 0, 0]], jnp.float32),
            rel_q=jnp.asarray([[1.0, 0, 0, 0]] * 3, jnp.float32),
            trans_weight=jnp.asarray([100.0, 0.0, 0.0]),
            rot_weight=jnp.asarray([100.0, 100.0, 100.0]),
            use_huber=jnp.zeros(3, bool), valid=jnp.ones(3, bool),
            fixed=jnp.asarray([True, False, True]),
            acc_i=jnp.asarray([0], jnp.int32), acc_j=jnp.asarray([1], jnp.int32),
            acc_k=jnp.asarray([2], jnp.int32),
            acc_delta_v=jnp.asarray([dv], jnp.float32),
            acc_dt1=jnp.asarray([dt]), acc_dt2=jnp.asarray([dt]),
            acc_weight=jnp.asarray([50.0]), acc_valid=jnp.ones(1, bool))
        t, q = solve_spa_3d(problem, num_iterations=30)
        np.testing.assert_allclose(np.asarray(t)[1], [0.5, 0, 0], atol=0.01)


class TestPoseGraphImuIntegration:
    def test_integrate_imu(self):
        from cartographer_tpu.core.config import PoseGraphOptions
        from cartographer_tpu.mapping.pose_graph_3d import PoseGraph3D
        from cartographer_tpu.sensor.data import ImuData

        pg = PoseGraph3D(PoseGraphOptions())
        for k in range(21):
            pg.add_imu_data(0, ImuData(
                time=k * 100_000,
                linear_acceleration=np.array([0.0, 0.0, 9.806]),
                angular_velocity=np.array([0.0, 0.0, 0.5])))
        out = pg._integrate_imu(0, 200_000, 1_200_000)
        assert out is not None
        dq, dv, dt = out
        assert abs(dt - 1.0) < 1e-6
        # Gyro: 0.5 rad/s for 1 s -> 0.5 rad yaw.
        from cartographer_tpu.transform import nquat
        assert abs(nquat.get_yaw(dq) - 0.5) < 0.02
        # Accel: ~9.8 m/s upward measured (rotating frame, z-axis rotation
        # leaves z untouched).
        assert abs(dv[2] - 9.806) < 0.05


class TestLearnedImuCalibration:
    """The per-trajectory gravity constant + imu_calibration quaternion are
    free variables (optimization_problem_3d.cc:365-446, TrajectoryData)."""

    def _make_problem(self, g_true, calib_true, n=12):
        rng = np.random.RandomState(3)
        dt = 0.4
        # Ground-truth poses: a wavy trajectory with varying orientation so
        # the calibration is observable.
        ts, qs = [], []
        for k in range(n):
            ts.append([0.7 * k, 0.5 * np.sin(0.9 * k), 0.2 * np.cos(0.7 * k)])
            axis = np.array([np.sin(0.3 * k), np.cos(0.5 * k), 0.4])
            qs.append(np.asarray(quat.from_axis_angle(
                jnp.asarray(0.25 * axis * np.sin(0.6 * k + 0.2)))))
        ts = np.asarray(ts, np.float32)
        qs = np.asarray(qs, np.float32)

        # Acceleration triplets with delta_v generated from the true gravity
        # and calibration: dv = calib^-1 (R_j^-1 (second_diff + g dt z)).
        acc_i, acc_j, acc_k, acc_dv = [], [], [], []
        z = np.array([0.0, 0.0, 1.0])
        for k in range(n - 2):
            second_diff = (ts[k + 2] - ts[k + 1]) / dt - (ts[k + 1] - ts[k]) / dt
            world = second_diff + g_true * dt * z
            body = np.asarray(quat.rotate(quat.conjugate(jnp.asarray(qs[k + 1])),
                                          jnp.asarray(world)))
            dv = np.asarray(quat.rotate(quat.conjugate(jnp.asarray(calib_true)),
                                        jnp.asarray(body)))
            acc_i.append(k); acc_j.append(k + 1); acc_k.append(k + 2)
            acc_dv.append(dv)
        # Rotation constraints consistent with the true calibration:
        # delta = calib^-1 (q_i^-1 q_j) calib.
        rot_i, rot_j, rot_dq = [], [], []
        for k in range(n - 1):
            rel = quat.multiply(quat.conjugate(jnp.asarray(qs[k])),
                                jnp.asarray(qs[k + 1]))
            dq = quat.multiply(
                quat.conjugate(jnp.asarray(calib_true)),
                quat.multiply(rel, jnp.asarray(calib_true)))
            rot_i.append(k); rot_j.append(k + 1)
            rot_dq.append(np.asarray(dq))

        return SpaProblem3D(
            translations=jnp.asarray(ts), rotations=jnp.asarray(qs),
            a_idx=jnp.zeros(1, jnp.int32), b_idx=jnp.zeros(1, jnp.int32),
            rel_t=jnp.zeros((1, 3)), rel_q=jnp.asarray([[1.0, 0, 0, 0]]),
            trans_weight=jnp.zeros(1), rot_weight=jnp.zeros(1),
            use_huber=jnp.zeros(1, bool), valid=jnp.zeros(1, bool),
            fixed=jnp.ones(n, bool),  # poses pinned: solve for IMU vars only
            acc_i=jnp.asarray(acc_i, jnp.int32),
            acc_j=jnp.asarray(acc_j, jnp.int32),
            acc_k=jnp.asarray(acc_k, jnp.int32),
            acc_delta_v=jnp.asarray(np.asarray(acc_dv), jnp.float32),
            acc_dt1=jnp.full(len(acc_i), dt), acc_dt2=jnp.full(len(acc_i), dt),
            acc_weight=jnp.full(len(acc_i), 10.0),
            acc_valid=jnp.ones(len(acc_i), bool),
            acc_traj=jnp.zeros(len(acc_i), jnp.int32),
            rot_i=jnp.asarray(rot_i, jnp.int32),
            rot_j=jnp.asarray(rot_j, jnp.int32),
            rot_delta_q=jnp.asarray(np.asarray(rot_dq), jnp.float32),
            rot_c_weight=jnp.full(len(rot_i), 10.0),
            rot_valid=jnp.ones(len(rot_i), bool),
            rot_traj=jnp.zeros(len(rot_i), jnp.int32),
            gravity_init=jnp.asarray([9.8], jnp.float32),
            imu_calibration_init=jnp.asarray([[1.0, 0, 0, 0]], jnp.float32))

    def test_converges_to_true_gravity_and_calibration(self):
        g_true = 9.45
        calib_true = quat.normalize(jnp.asarray(
            [np.cos(0.04), np.sin(0.04) * 0.6, np.sin(0.04) * 0.8, 0.0]))
        problem = self._make_problem(g_true, calib_true)
        t, q, grav, calib = solve_spa_3d(
            problem, num_iterations=40, learn_gravity=True,
            learn_imu_calibration=True, return_trajectory_data=True)
        assert abs(float(grav[0]) - g_true) < 0.02
        dot = abs(float(jnp.sum(calib[0] * calib_true)))
        assert dot > 0.9999, f"calibration off: |<q, q_true>| = {dot}"

    def test_gravity_only_when_extrinsics_off(self):
        g_true = 9.6
        calib_true = jnp.asarray([1.0, 0.0, 0.0, 0.0])
        problem = self._make_problem(g_true, calib_true)
        t, q, grav, calib = solve_spa_3d(
            problem, num_iterations=40, learn_gravity=True,
            learn_imu_calibration=False, return_trajectory_data=True)
        assert abs(float(grav[0]) - g_true) < 0.02
        np.testing.assert_allclose(np.asarray(calib[0]), [1, 0, 0, 0], atol=1e-6)

    def test_gravity_lower_bound(self):
        # A problem whose unconstrained optimum would be negative gravity
        # stays clamped at >= 0 (SetParameterLowerBound analog).
        calib_true = jnp.asarray([1.0, 0.0, 0.0, 0.0])
        problem = self._make_problem(-3.0, calib_true)
        t, q, grav, _ = solve_spa_3d(
            problem, num_iterations=40, learn_gravity=True,
            learn_imu_calibration=False, return_trajectory_data=True)
        assert float(grav[0]) >= 0.0
