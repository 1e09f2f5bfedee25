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
    """V pose slots ([t (3), q (4)]) and C two-slot constraints."""

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
                 fix_z: bool = False):
    """Returns (translations (V, 3), rotations (V, 4)) optimized."""
    V = problem.translations.shape[0]

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
