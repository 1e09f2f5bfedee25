"""Sparse pose adjustment (SPA) for 2D pose graphs [KERNEL].

Reference: mapping/internal/optimization/optimization_problem_2d.cc + the
residual of cost_functions/spa_cost_function_2d.cc: for a constraint with
relative pose z_ab between poses a and b,

    e = [ R(theta_a)^T (t_b - t_a) - z_t ;  wrap(theta_b - theta_a - z_theta) ]

weighted by (translation_weight, rotation_weight), Huber loss on inter-submap
constraints.

TPU design: Ceres' sparse Schur solver becomes batched Gauss-Newton with
IRLS Huber weights: per-constraint 3x6 Jacobians via vmapped jacfwd, normal
equations assembled with one scatter-add of 6x6 blocks into a dense H (the
pose-graph sizes Cartographer runs — thousands of poses — fit a dense
Cholesky on one chip comfortably; multi-host Schur-complement sharding lives
in cartographer_tpu.parallel). Both submap-node and node-node (odometry /
local-SLAM) constraints use the same generic two-slot layout.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpaProblem2D:
    """Static-shape SPA problem over V pose slots and C constraint slots."""

    poses: jnp.ndarray  # (V, 3) [x, y, theta] initial values
    a_idx: jnp.ndarray  # (C,) int32 first pose slot ("submap"/from)
    b_idx: jnp.ndarray  # (C,) int32 second pose slot ("node"/to)
    rel: jnp.ndarray  # (C, 3) measured a^-1 * b
    trans_weight: jnp.ndarray  # (C,)
    rot_weight: jnp.ndarray  # (C,)
    use_huber: jnp.ndarray  # (C,) bool — Huber loss on this constraint
    valid: jnp.ndarray  # (C,) bool — padding mask
    fixed: jnp.ndarray  # (V,) bool — frozen pose slots (e.g. first submap)


def _wrap_angle(a):
    return a - 2.0 * jnp.pi * jnp.floor((a + jnp.pi) / (2.0 * jnp.pi))


def constraint_residual(pose_a: jnp.ndarray, pose_b: jnp.ndarray,
                        rel: jnp.ndarray, tw, rw) -> jnp.ndarray:
    """Weighted 3-residual of one constraint (spa_cost_function_2d.cc)."""
    c, s = jnp.cos(pose_a[2]), jnp.sin(pose_a[2])
    d = pose_b[0:2] - pose_a[0:2]
    local = jnp.array([c * d[0] + s * d[1], -s * d[0] + c * d[1]])
    e_t = (local - rel[0:2]) * tw
    e_r = _wrap_angle(pose_b[2] - pose_a[2] - rel[2]) * rw
    return jnp.concatenate([e_t, e_r[None]])


def solve_spa_2d(problem: SpaProblem2D, num_iterations: int = 50,
                 huber_scale: float = 1e1, damping: float = 1e-6) -> jnp.ndarray:
    """Gauss-Newton with IRLS Huber weighting; returns optimized poses (V, 3).

    Weights are normalized by their maximum before use (argmin-invariant;
    the Huber threshold rescales by the same factor) so the reference's
    1e4-1e5-scale weights stay conditioned in float32 — Ceres solves the
    same problem in double.
    """
    V = problem.poses.shape[0]
    wmax = jnp.maximum(
        jnp.max(jnp.where(problem.valid, problem.trans_weight, 0.0)),
        jnp.max(jnp.where(problem.valid, problem.rot_weight, 0.0)))
    wmax = jnp.maximum(wmax, 1e-12)
    problem = dataclasses.replace(
        problem,
        trans_weight=problem.trans_weight / wmax,
        rot_weight=problem.rot_weight / wmax)
    huber_scale = huber_scale / wmax

    def res_of_pair(pa, pb, rel, tw, rw):
        return constraint_residual(pa, pb, rel, tw, rw)

    jac_a = jax.vmap(jax.jacfwd(res_of_pair, argnums=0))
    jac_b = jax.vmap(jax.jacfwd(res_of_pair, argnums=1))
    res_v = jax.vmap(res_of_pair)

    free = ~problem.fixed  # (V,)

    def weighted_residuals(poses):
        pa = poses[problem.a_idx]
        pb = poses[problem.b_idx]
        r = res_v(pa, pb, problem.rel, problem.trans_weight, problem.rot_weight)
        # Huber IRLS: scale each constraint by sqrt(rho'(||r||^2)).
        s = jnp.sum(r * r, axis=-1)
        hw = jnp.where(
            problem.use_huber & (s > huber_scale**2),
            jnp.sqrt(huber_scale / jnp.sqrt(jnp.maximum(s, 1e-12))),
            1.0,
        )
        w = jnp.where(problem.valid, hw, 0.0)[:, None]
        return pa, pb, r * w, w

    def iteration(carry, _):
        poses, lam = carry
        pa, pb, r, w = weighted_residuals(poses)
        Ja = jac_a(pa, pb, problem.rel, problem.trans_weight, problem.rot_weight) * w[:, :, None]
        Jb = jac_b(pa, pb, problem.rel, problem.trans_weight, problem.rot_weight) * w[:, :, None]
        J = jnp.concatenate([Ja, Jb], axis=-1)  # (C, 3, 6)

        JtJ = jnp.einsum("cri,crj->cij", J, J)  # (C, 6, 6)
        Jtr = jnp.einsum("cri,cr->ci", J, r)  # (C, 6)

        base_a = problem.a_idx * 3
        base_b = problem.b_idx * 3
        cols = jnp.concatenate(
            [base_a[:, None] + jnp.arange(3)[None, :],
             base_b[:, None] + jnp.arange(3)[None, :]], axis=1)  # (C, 6)

        H = jnp.zeros((V * 3, V * 3), jnp.float32)
        H = H.at[cols[:, :, None], cols[:, None, :]].add(JtJ)
        g = jnp.zeros((V * 3,), jnp.float32).at[cols].add(Jtr)

        # Fix frozen slots: identity rows/cols, zero gradient.
        free_flat = jnp.repeat(free, 3)
        H = H * (free_flat[:, None] & free_flat[None, :])
        # Levenberg-Marquardt scale-aware damping (Ceres' trust-region
        # role): lam * |diag(H)| keeps the step well-posed under extreme
        # weight ratios; `damping` is the absolute floor.
        diag_h = jnp.diagonal(H)
        H = H + jnp.diag(jnp.where(free_flat,
                                   lam * jnp.abs(diag_h) + damping, 1.0))
        g = jnp.where(free_flat, g, 0.0)

        dx = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(H), -g)
        cand = poses + dx.reshape(V, 3)
        # LM accept/reject: the step must reduce the IRLS-weighted cost and
        # be finite; a NaN Cholesky (singular system) self-heals this way.
        cost0 = jnp.sum(r * r)
        r1 = weighted_residuals(cand)[2]
        cost1 = jnp.sum(r1 * r1)
        accept = jnp.isfinite(cost1) & (cost1 <= cost0)
        poses = jnp.where(accept, cand, poses)
        lam = jnp.clip(jnp.where(accept, lam / 3.0, lam * 8.0), 1e-8, 1e8)
        return (poses, lam), None

    (poses, _), _ = jax.lax.scan(iteration, (problem.poses, jnp.float32(1e-4)),
                                 None, length=num_iterations)
    return poses
