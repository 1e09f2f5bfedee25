"""SE(3) sparse pose adjustment for the 3D pose graph [KERNEL].

Reference: mapping/internal/optimization/optimization_problem_3d.cc — SE(3)
constraints with quaternion parameterization (spa_cost_function_3d.h),
Huber loss on inter-submap constraints. IMU/odometry/fixed-frame residuals
are added by the pose graph layer as additional generic constraints.

TPU design: Gauss-Newton on the 6-dim tangent per pose ([dt, so3], boxplus
retraction replacing Ceres' quaternion local parameterization); per-
constraint Jacobians via vmapped jacfwd at the tangent origin; dense normal
equations assembled by block scatter-add and solved with Cholesky. Weights
are normalized by their maximum before squaring so the reference's 1e5-scale
weights stay well-conditioned in float32 (Ceres solves in double).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cartographer_tpu.transform import quaternion as quat


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpaProblem3D:
    """V pose slots ([t (3), q (4)]), C two-slot constraints, and optional
    A acceleration triplets (IMU preintegration residuals,
    optimization_problem_3d.cc:365-446)."""

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
    # Acceleration triplets (i, j, k) = consecutive nodes: the IMU-measured
    # middle-frame delta velocity vs the pose second difference
    # (AccelerationCostFunction3D). Empty arrays (A=0) disable the term.
    acc_i: jnp.ndarray = None  # (A,)
    acc_j: jnp.ndarray = None  # (A,)
    acc_k: jnp.ndarray = None  # (A,)
    acc_delta_v: jnp.ndarray = None  # (A, 3) integrated IMU delta velocity in frame j
    acc_dt1: jnp.ndarray = None  # (A,) seconds i -> j
    acc_dt2: jnp.ndarray = None  # (A,) seconds j -> k
    acc_weight: jnp.ndarray = None  # (A,)
    acc_valid: jnp.ndarray = None  # (A,) bool


def acceleration_residual_3d(ti, tj, tk, qj, delta_v, dt1, dt2, weight,
                             gravity_constant=9.806) -> jnp.ndarray:
    """AccelerationCostFunction3D: the world-frame velocity change between
    the (i,j) and (j,k) intervals equals the IMU-measured specific-force
    integral (delta_v, in frame j) minus world gravity:
        second_diff = R_j * delta_v - g * z_world * dt_sum
    Residual expressed in frame j. (The reference additionally learns a
    per-trajectory gravity constant and IMU calibration quaternion; here
    gravity is the configured constant and calibration is identity.)"""
    dt_sum = 0.5 * (dt1 + dt2)
    second_diff = (tk - tj) / dt2 - (tj - ti) / dt1
    z_world = jnp.array([0.0, 0.0, 1.0])
    lhs = quat.rotate(quat.conjugate(qj),
                      second_diff + gravity_constant * dt_sum * z_world)
    return weight * (lhs - delta_v)


def constraint_residual_3d(ta, qa, tb, qb, rel_t, rel_q, tw, rw) -> jnp.ndarray:
    """6-residual of one SE(3) constraint (spa_cost_function_3d.h):
    [R_a^T (t_b - t_a) - rel_t] * tw ; log(rel_q^-1 q_a^-1 q_b) * rw."""
    local_t = quat.rotate(quat.conjugate(qa), tb - ta)
    e_t = (local_t - rel_t) * tw
    dq = quat.multiply(quat.conjugate(rel_q),
                       quat.multiply(quat.conjugate(qa), qb))
    e_r = quat.to_axis_angle(dq) * rw
    return jnp.concatenate([e_t, e_r])


def solve_spa_3d(problem: SpaProblem3D, num_iterations: int = 50,
                 huber_scale: float = 1e1, damping: float = 1e-6,
                 fix_z: bool = False, gravity_constant: float = 9.806):
    """Returns (translations (V, 3), rotations (V, 4)) optimized."""
    V = problem.translations.shape[0]
    has_acc = problem.acc_i is not None

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
        ta2 = ta + da[0:3]
        qa2 = quat.normalize(quat.multiply(qa, quat.from_axis_angle(da[3:6])))
        tb2 = tb + db[0:3]
        qb2 = quat.normalize(quat.multiply(qb, quat.from_axis_angle(db[3:6])))
        return constraint_residual_3d(ta2, qa2, tb2, qb2, rel_t, rel_q, tw_c, rw_c)

    zero6 = jnp.zeros(6)
    jac_a = jax.vmap(jax.jacfwd(local_residual, argnums=0),
                     in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0))
    jac_b = jax.vmap(jax.jacfwd(local_residual, argnums=1),
                     in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0))
    res_v = jax.vmap(constraint_residual_3d)

    free = ~problem.fixed

    def iteration(state, _):
        t, q = state
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
        H = jnp.zeros((V * 6, V * 6), jnp.float32)
        H = H.at[cols[:, :, None], cols[:, None, :]].add(JtJ)
        g = jnp.zeros((V * 6,), jnp.float32).at[cols].add(Jtr)

        if has_acc:
            aw = problem.acc_weight / wmax

            def acc_local(d_i, d_j, d_k, ti, tj, tk, qj, dv, dt1, dt2, w):
                ti2 = ti + d_i[0:3]
                tj2 = tj + d_j[0:3]
                tk2 = tk + d_k[0:3]
                qj2 = quat.normalize(
                    quat.multiply(qj, quat.from_axis_angle(d_j[3:6])))
                return acceleration_residual_3d(
                    ti2, tj2, tk2, qj2, dv, dt1, dt2, w, gravity_constant)

            axes = (None, None, None, 0, 0, 0, 0, 0, 0, 0, 0)
            ti_, tj_, tk_ = (t[problem.acc_i], t[problem.acc_j], t[problem.acc_k])
            qj_ = q[problem.acc_j]
            args = (ti_, tj_, tk_, qj_, problem.acc_delta_v,
                    problem.acc_dt1, problem.acc_dt2, aw)
            ra = jax.vmap(acc_local, in_axes=axes)(zero6, zero6, zero6, *args)
            wv = problem.acc_valid.astype(jnp.float32)[:, None]
            ra = ra * wv
            Ji = jax.vmap(jax.jacfwd(acc_local, argnums=0), in_axes=axes)(
                zero6, zero6, zero6, *args) * wv[:, :, None]
            Jj = jax.vmap(jax.jacfwd(acc_local, argnums=1), in_axes=axes)(
                zero6, zero6, zero6, *args) * wv[:, :, None]
            Jk = jax.vmap(jax.jacfwd(acc_local, argnums=2), in_axes=axes)(
                zero6, zero6, zero6, *args) * wv[:, :, None]
            Ja3 = jnp.concatenate([Ji, Jj, Jk], axis=-1)  # (A, 3, 18)
            JtJ3 = jnp.einsum("cri,crj->cij", Ja3, Ja3)
            Jtr3 = jnp.einsum("cri,cr->ci", Ja3, ra)
            cols3 = jnp.concatenate(
                [problem.acc_i[:, None] * 6 + jnp.arange(6)[None, :],
                 problem.acc_j[:, None] * 6 + jnp.arange(6)[None, :],
                 problem.acc_k[:, None] * 6 + jnp.arange(6)[None, :]], axis=1)
            H = H.at[cols3[:, :, None], cols3[:, None, :]].add(JtJ3)
            g = g.at[cols3].add(Jtr3)

        free_flat = jnp.repeat(free, 6)
        if fix_z:
            # optimization_problem options fix_z_in_3d: freeze the z tangent.
            z_mask = jnp.tile(jnp.array([True, True, False, True, True, True]), V)
            free_flat = free_flat & z_mask
        H = H * (free_flat[:, None] & free_flat[None, :])
        H = H + jnp.diag(jnp.where(free_flat, damping, 1.0))
        g = jnp.where(free_flat, g, 0.0)
        dx = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(H), -g)
        dx = dx.reshape(V, 6)
        t = t + dx[:, 0:3]
        q = quat.normalize(quat.multiply(q, quat.from_axis_angle(dx[:, 3:6])))
        return (t, q), None

    (t, q), _ = jax.lax.scan(
        iteration, (problem.translations, problem.rotations), None,
        length=num_iterations)
    return t, q
