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
