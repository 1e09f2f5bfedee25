"""SE(3) sparse pose adjustment for the 3D pose graph [KERNEL].

Reference: mapping/internal/optimization/optimization_problem_3d.cc — SE(3)
constraints with quaternion parameterization (spa_cost_function_3d.h),
Huber loss on inter-submap constraints, and the IMU blocks of
optimization_problem_3d.cc:365-446: per-trajectory learned `gravity_constant`
(lower-bounded at 0) and `imu_calibration` quaternion shared by the
acceleration triplets (AccelerationCostFunction3D) and the gyro rotation
constraints (RotationCostFunction3D).

TPU design: Gauss-Newton on a flat tangent = [6 per pose | 4 per trajectory
(gravity, so3 calibration)], boxplus retraction replacing Ceres' quaternion
local parameterization; per-constraint Jacobians via vmapped jacfwd at the
tangent origin; dense normal equations assembled by block scatter-add and
solved with Cholesky. The gravity lower bound becomes a post-step clamp.
Weights are normalized by their maximum before squaring so the reference's
1e5-scale weights stay well-conditioned in float32 (Ceres solves in double).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cartographer_tpu.transform import quaternion as quat


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpaProblem3D:
    """V pose slots ([t (3), q (4)]), C two-slot constraints, optional
    A acceleration triplets and R gyro rotation constraints (both indexed
    into T per-trajectory IMU variable blocks)."""

    translations: jnp.ndarray  # (V, 3)
    rotations: jnp.ndarray  # (V, 4)
    a_idx: jnp.ndarray  # (C,)
    b_idx: jnp.ndarray  # (C,)
    rel_t: jnp.ndarray  # (C, 3) measured a^-1 * b translation
    rel_q: jnp.ndarray  # (C, 4) measured a^-1 * b rotation
    trans_weight: jnp.ndarray  # (C,)
    rot_weight: jnp.ndarray  # (C,)
    use_huber: jnp.ndarray  # (C,) bool
    valid: jnp.ndarray  # (C,) bool
    fixed: jnp.ndarray  # (V,) bool
    # Yaw-only rotation parameterization per pose slot (the reference's
    # fixed-frame origin blocks, optimization_problem_3d.cc:540-551
    # YawOnlyQuaternionPlus): body-frame x/y rotation tangents frozen. Exact
    # for slots whose rotation is a pure yaw (body z == world z).
    yaw_only: jnp.ndarray = None  # (V,) bool
    # Acceleration triplets (i, j, k) = consecutive nodes: the IMU-measured
    # middle-frame delta velocity vs the pose second difference
    # (AccelerationCostFunction3D). Empty arrays (A=0) disable the term.
    acc_i: jnp.ndarray = None  # (A,)
    acc_j: jnp.ndarray = None  # (A,)
    acc_k: jnp.ndarray = None  # (A,)
    acc_delta_v: jnp.ndarray = None  # (A, 3) IMU delta velocity in frame j (imu frame)
    acc_dt1: jnp.ndarray = None  # (A,) seconds i -> j
    acc_dt2: jnp.ndarray = None  # (A,) seconds j -> k
    acc_weight: jnp.ndarray = None  # (A,)
    acc_valid: jnp.ndarray = None  # (A,) bool
    acc_traj: jnp.ndarray = None  # (A,) trajectory variable slot
    # Gyro rotation constraints (RotationCostFunction3D), conjugated by the
    # learned calibration so they cannot fold into the generic constraints.
    rot_i: jnp.ndarray = None  # (R,)
    rot_j: jnp.ndarray = None  # (R,)
    rot_delta_q: jnp.ndarray = None  # (R, 4) gyro-integrated delta rotation
    rot_c_weight: jnp.ndarray = None  # (R,)
    rot_valid: jnp.ndarray = None  # (R,) bool
    rot_traj: jnp.ndarray = None  # (R,) trajectory variable slot
    # Per-trajectory IMU variable blocks (TrajectoryData).
    gravity_init: jnp.ndarray = None  # (T,)
    imu_calibration_init: jnp.ndarray = None  # (T, 4)


def acceleration_residual_3d(ti, tj, tk, qj, delta_v, dt1, dt2, weight,
                             gravity=9.806, calib_q=None) -> jnp.ndarray:
    """AccelerationCostFunction3D (acceleration_cost_function_3d.h): the
    world-frame velocity change between the (i,j) and (j,k) interval midpoints
    equals the IMU-measured specific-force integral (delta_v, in the IMU frame
    at pose j) rotated by the learned calibration, minus world gravity:

        r = w * (R_j * (calib ⊗ delta_v) - g * dt_sum * z  -  second_diff)
        second_diff = (tk - tj)/dt2 - (tj - ti)/dt1
    """
    if calib_q is None:
        calib_q = jnp.array([1.0, 0.0, 0.0, 0.0])
    dt_sum = 0.5 * (dt1 + dt2)
    second_diff = (tk - tj) / dt2 - (tj - ti) / dt1
    z_world = jnp.array([0.0, 0.0, 1.0])
    imu_dv = (quat.rotate(qj, quat.rotate(calib_q, delta_v))
              - gravity * dt_sum * z_world)
    return weight * (imu_dv - second_diff)


def rotation_residual_3d(qi, qj, delta_q, calib_q, weight) -> jnp.ndarray:
    """RotationCostFunction3D (rotation_cost_function_3d.h): residual is the
    vector part of  q_j^-1 ⊗ q_i ⊗ calib ⊗ delta_q ⊗ calib^-1."""
    err = quat.multiply(
        quat.conjugate(qj),
        quat.multiply(qi,
                      quat.multiply(calib_q,
                                    quat.multiply(delta_q,
                                                  quat.conjugate(calib_q)))))
    return weight * err[1:4]


def constraint_residual_3d(ta, qa, tb, qb, rel_t, rel_q, tw, rw) -> jnp.ndarray:
    """6-residual of one SE(3) constraint (spa_cost_function_3d.h):
    [R_a^T (t_b - t_a) - rel_t] * tw ; log(rel_q^-1 q_a^-1 q_b) * rw."""
    local_t = quat.rotate(quat.conjugate(qa), tb - ta)
    e_t = (local_t - rel_t) * tw
    dq = quat.multiply(quat.conjugate(rel_q),
                       quat.multiply(quat.conjugate(qa), qb))
    e_r = quat.to_axis_angle(dq) * rw
    return jnp.concatenate([e_t, e_r])


def _retract_pose(t, q, d6):
    return (t + d6[..., 0:3],
            quat.normalize(quat.multiply(q, quat.from_axis_angle(d6[..., 3:6]))))


def solve_spa_3d(problem: SpaProblem3D, num_iterations: int = 50,
                 huber_scale: float = 1e1, damping: float = 1e-6,
                 fix_z: bool = False, gravity_constant: float = 9.806,
                 learn_gravity: bool = False,
                 learn_imu_calibration: bool = False,
                 return_trajectory_data: bool = False):
    """Gauss-Newton SPA solve.

    Args:
      learn_gravity: free the per-trajectory gravity constants (the reference
        always frees them when IMU residuals exist and fix_z is off;
        optimization_problem_3d.cc:444-446 keeps them >= 0).
      learn_imu_calibration: free the calibration quaternions
        (options use_online_imu_extrinsics_in_3d).
      return_trajectory_data: additionally return (gravity (T,), calib (T,4)).

    Returns (translations, rotations) optimized, plus trajectory data when
    requested.
    """
    V = problem.translations.shape[0]
    has_acc = problem.acc_i is not None
    has_rot = problem.rot_i is not None

    # Per-trajectory variable blocks; a single fixed block serves legacy
    # problems that do not carry them.
    if problem.gravity_init is not None:
        g_init = problem.gravity_init
    else:
        g_init = jnp.full((1,), gravity_constant, jnp.float32)
    if problem.imu_calibration_init is not None:
        c_init = problem.imu_calibration_init
    else:
        c_init = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]], jnp.float32),
                          (g_init.shape[0], 1))
    T = g_init.shape[0]
    acc_traj = (problem.acc_traj if problem.acc_traj is not None
                else (jnp.zeros_like(problem.acc_i) if has_acc else None))
    rot_traj = (problem.rot_traj if problem.rot_traj is not None
                else (jnp.zeros_like(problem.rot_i) if has_rot else None))

    # Normalize weights for f32 conditioning (argmin-invariant; Huber
    # threshold rescales by the same factor).
    wmax = jnp.maximum(
        jnp.max(jnp.where(problem.valid, problem.trans_weight, 0.0)),
        jnp.max(jnp.where(problem.valid, problem.rot_weight, 0.0)))
    wmax = jnp.maximum(wmax, 1e-12)
    tw = problem.trans_weight / wmax
    rw = problem.rot_weight / wmax
    huber = huber_scale / wmax

    def local_residual(da, db, ta, qa, tb, qb, rel_t, rel_q, tw_c, rw_c):
        ta2, qa2 = _retract_pose(ta, qa, da)
        tb2, qb2 = _retract_pose(tb, qb, db)
        return constraint_residual_3d(ta2, qa2, tb2, qb2, rel_t, rel_q, tw_c, rw_c)

    zero6 = jnp.zeros(6)
    zero4 = jnp.zeros(4)  # trajectory tangent: [d_gravity, d_calib (so3)]
    jac_a = jax.vmap(jax.jacfwd(local_residual, argnums=0),
                     in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0))
    jac_b = jax.vmap(jax.jacfwd(local_residual, argnums=1),
                     in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0))
    res_v = jax.vmap(constraint_residual_3d)

    free = ~problem.fixed
    D = V * 6 + T * 4
    aw_n = problem.acc_weight / wmax if has_acc else None
    gw_n = problem.rot_c_weight / wmax if has_rot else None

    def total_cost(t, q, grav, calib):
        """IRLS-weighted squared-residual cost at a state (for the LM
        accept/reject test)."""
        ta, qa = t[problem.a_idx], q[problem.a_idx]
        tb, qb = t[problem.b_idx], q[problem.b_idx]
        r = res_v(ta, qa, tb, qb, problem.rel_t, problem.rel_q, tw, rw)
        s = jnp.sum(r * r, axis=-1)
        hw = jnp.where(problem.use_huber & (s > huber**2),
                       jnp.sqrt(huber / jnp.sqrt(jnp.maximum(s, 1e-18))), 1.0)
        w = jnp.where(problem.valid, hw, 0.0)[:, None]
        c = jnp.sum((r * w) ** 2)
        if has_acc:
            ra = jax.vmap(acceleration_residual_3d)(
                t[problem.acc_i], t[problem.acc_j], t[problem.acc_k],
                q[problem.acc_j], problem.acc_delta_v, problem.acc_dt1,
                problem.acc_dt2, aw_n, grav[acc_traj], calib[acc_traj])
            c = c + jnp.sum(
                (ra * problem.acc_valid.astype(jnp.float32)[:, None]) ** 2)
        if has_rot:
            rr = jax.vmap(rotation_residual_3d)(
                q[problem.rot_i], q[problem.rot_j], problem.rot_delta_q,
                calib[rot_traj], gw_n)
            c = c + jnp.sum(
                (rr * problem.rot_valid.astype(jnp.float32)[:, None]) ** 2)
        return c

    def iteration(state, _):
        t, q, grav, calib, lam = state
        ta, qa = t[problem.a_idx], q[problem.a_idx]
        tb, qb = t[problem.b_idx], q[problem.b_idx]
        r = res_v(ta, qa, tb, qb, problem.rel_t, problem.rel_q, tw, rw)
        s = jnp.sum(r * r, axis=-1)
        hw = jnp.where(problem.use_huber & (s > huber**2),
                       jnp.sqrt(huber / jnp.sqrt(jnp.maximum(s, 1e-18))), 1.0)
        w = jnp.where(problem.valid, hw, 0.0)[:, None]
        r = r * w
        Ja = jac_a(zero6, zero6, ta, qa, tb, qb,
                   problem.rel_t, problem.rel_q, tw, rw) * w[:, :, None]
        Jb = jac_b(zero6, zero6, ta, qa, tb, qb,
                   problem.rel_t, problem.rel_q, tw, rw) * w[:, :, None]
        J = jnp.concatenate([Ja, Jb], axis=-1)  # (C, 6, 12)
        JtJ = jnp.einsum("cri,crj->cij", J, J)
        Jtr = jnp.einsum("cri,cr->ci", J, r)
        cols = jnp.concatenate(
            [problem.a_idx[:, None] * 6 + jnp.arange(6)[None, :],
             problem.b_idx[:, None] * 6 + jnp.arange(6)[None, :]], axis=1)
        H = jnp.zeros((D, D), jnp.float32)
        H = H.at[cols[:, :, None], cols[:, None, :]].add(JtJ)
        g = jnp.zeros((D,), jnp.float32).at[cols].add(Jtr)

        if has_acc:
            aw = problem.acc_weight / wmax

            def acc_local(d_i, d_j, d_k, d_t, ti, tj, tk, qj, gv, cq,
                          dv, dt1, dt2, w):
                ti2 = ti + d_i[0:3]
                tk2 = tk + d_k[0:3]
                tj2, qj2 = _retract_pose(tj, qj, d_j)
                gv2 = gv + d_t[0]
                cq2 = quat.normalize(
                    quat.multiply(cq, quat.from_axis_angle(d_t[1:4])))
                return acceleration_residual_3d(
                    ti2, tj2, tk2, qj2, dv, dt1, dt2, w, gv2, cq2)

            axes = (None, None, None, None, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
            args = (t[problem.acc_i], t[problem.acc_j], t[problem.acc_k],
                    q[problem.acc_j], grav[acc_traj], calib[acc_traj],
                    problem.acc_delta_v, problem.acc_dt1, problem.acc_dt2, aw)
            ra = jax.vmap(acc_local, in_axes=axes)(
                zero6, zero6, zero6, zero4, *args)
            wv = problem.acc_valid.astype(jnp.float32)[:, None]
            ra = ra * wv
            jacs = [jax.vmap(jax.jacfwd(acc_local, argnums=n), in_axes=axes)(
                        zero6, zero6, zero6, zero4, *args) * wv[:, :, None]
                    for n in (0, 1, 2, 3)]
            Ja3 = jnp.concatenate(jacs, axis=-1)  # (A, 3, 22)
            JtJ3 = jnp.einsum("cri,crj->cij", Ja3, Ja3)
            Jtr3 = jnp.einsum("cri,cr->ci", Ja3, ra)
            cols3 = jnp.concatenate(
                [problem.acc_i[:, None] * 6 + jnp.arange(6)[None, :],
                 problem.acc_j[:, None] * 6 + jnp.arange(6)[None, :],
                 problem.acc_k[:, None] * 6 + jnp.arange(6)[None, :],
                 V * 6 + acc_traj[:, None] * 4 + jnp.arange(4)[None, :]],
                axis=1)
            H = H.at[cols3[:, :, None], cols3[:, None, :]].add(JtJ3)
            g = g.at[cols3].add(Jtr3)

        if has_rot:
            gw = problem.rot_c_weight / wmax

            def rot_local(d_i, d_j, d_t, qi, qj, cq, dq, w):
                qi2 = quat.normalize(
                    quat.multiply(qi, quat.from_axis_angle(d_i[3:6])))
                qj2 = quat.normalize(
                    quat.multiply(qj, quat.from_axis_angle(d_j[3:6])))
                cq2 = quat.normalize(
                    quat.multiply(cq, quat.from_axis_angle(d_t[1:4])))
                return rotation_residual_3d(qi2, qj2, dq, cq2, w)

            axes = (None, None, None, 0, 0, 0, 0, 0)
            args = (q[problem.rot_i], q[problem.rot_j], calib[rot_traj],
                    problem.rot_delta_q, gw)
            rr = jax.vmap(rot_local, in_axes=axes)(zero6, zero6, zero4, *args)
            wv = problem.rot_valid.astype(jnp.float32)[:, None]
            rr = rr * wv
            jacs = [jax.vmap(jax.jacfwd(rot_local, argnums=n), in_axes=axes)(
                        zero6, zero6, zero4, *args) * wv[:, :, None]
                    for n in (0, 1, 2)]
            Jr = jnp.concatenate(jacs, axis=-1)  # (R, 3, 16)
            JtJr = jnp.einsum("cri,crj->cij", Jr, Jr)
            Jtrr = jnp.einsum("cri,cr->ci", Jr, rr)
            colsr = jnp.concatenate(
                [problem.rot_i[:, None] * 6 + jnp.arange(6)[None, :],
                 problem.rot_j[:, None] * 6 + jnp.arange(6)[None, :],
                 V * 6 + rot_traj[:, None] * 4 + jnp.arange(4)[None, :]],
                axis=1)
            H = H.at[colsr[:, :, None], colsr[:, None, :]].add(JtJr)
            g = g.at[colsr].add(Jtrr)

        pose_free = jnp.repeat(free, 6)
        if fix_z:
            # optimization_problem options fix_z_in_3d: freeze the z tangent.
            z_mask = jnp.tile(jnp.array([True, True, False, True, True, True]), V)
            pose_free = pose_free & z_mask
        if problem.yaw_only is not None:
            yaw_mask = ~jnp.repeat(problem.yaw_only, 6) | jnp.tile(
                jnp.array([True, True, True, False, False, True]), V)
            pose_free = pose_free & yaw_mask
        traj_free = jnp.tile(
            jnp.array([learn_gravity] + [learn_imu_calibration] * 3), T)
        free_flat = jnp.concatenate([pose_free, traj_free])
        H = H * (free_flat[:, None] & free_flat[None, :])
        # Levenberg-Marquardt scale-aware damping (Ceres' trust region,
        # optimization_problem_3d.cc solver role): lam * |diag(H)| keeps the
        # step well-posed under extreme weight ratios; `damping` is the
        # absolute floor.
        diag_h = jnp.diagonal(H)
        H = H + jnp.diag(jnp.where(free_flat,
                                   lam * jnp.abs(diag_h) + damping, 1.0))
        g = jnp.where(free_flat, g, 0.0)
        dx = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(H), -g)
        dp = dx[:V * 6].reshape(V, 6)
        t2 = t + dp[:, 0:3]
        q2 = quat.normalize(quat.multiply(q, quat.from_axis_angle(dp[:, 3:6])))
        dt_traj = dx[V * 6:].reshape(T, 4)
        # SetParameterLowerBound(gravity, 0, 0.0): projected GN step.
        grav2 = jnp.maximum(grav + dt_traj[:, 0], 0.0)
        calib2 = quat.normalize(
            quat.multiply(calib, quat.from_axis_angle(dt_traj[:, 1:4])))
        # LM accept/reject: the step must reduce the cost and be finite;
        # a NaN Cholesky (singular system) self-heals via rejection.
        cost0 = total_cost(t, q, grav, calib)
        cost1 = total_cost(t2, q2, grav2, calib2)
        accept = jnp.isfinite(cost1) & (cost1 <= cost0)
        t = jnp.where(accept, t2, t)
        q = jnp.where(accept, q2, q)
        grav = jnp.where(accept, grav2, grav)
        calib = jnp.where(accept, calib2, calib)
        lam = jnp.clip(jnp.where(accept, lam / 3.0, lam * 8.0), 1e-8, 1e8)
        return (t, q, grav, calib, lam), None

    (t, q, grav, calib, _), _ = jax.lax.scan(
        iteration,
        (problem.translations, problem.rotations, g_init, c_init,
         jnp.float32(1e-4)), None,
        length=num_iterations)
    if return_trajectory_data:
        return t, q, grav, calib
    return t, q
