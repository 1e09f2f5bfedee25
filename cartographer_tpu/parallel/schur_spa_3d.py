"""SE(3) Schur-complement sparse pose adjustment, sharded over a device mesh.

The production 3D SPA solver (reference: the sparse Ceres solve of
mapping/internal/optimization/optimization_problem_3d.cc:566-567). The
normal equations have the same two-block structure as 2D
(parallel/schur_spa.py), with SE(3) blocks and IMU terms:

    H = [ A   B  ]   A: reduced-side block-diagonal — submaps, learned
        [ B^T T  ]      fixed-frame (GPS) origins, landmarks, and the
                        per-trajectory IMU variable blocks (gravity +
                        calibration quaternion) — none of which couple to
                        each other directly,
                     T: node-node block-BANDED: consecutive-node local-SLAM
                        /odometry chains and gyro rotation constraints
                        couple (j, j+1); the IMU acceleration TRIPLETS
                        (optimization_problem_3d.cc:398-431) couple
                        (i, i+1, i+2) — half-bandwidth 2,
                     B: reduced-node coupling from INTRA/INTER/GPS/landmark
                        constraints and the IMU terms' trajectory blocks.

The pentadiagonal T is NOT factored with a bespoke band solver: consecutive
node pairs fold into 12x12 super-blocks, making T block-TRIDIAGONAL again —
the same factorization/sweep as the 2D solver at HALF the sequential scan
length (the latency driver at 10^4 nodes).

Per Gauss-Newton iteration, exactly as in 2D:
  - each device assembles its constraint shard's contributions to A, the T
    band, and the gradient (one psum), and keeps per-constraint B blocks
    sparse (never an O(S*N) dense cross-term);
  - X = T^-1 [B^T | g_n] is COLUMN-SHARDED over the mesh (each device
    sweeps only its own reduced-block columns);
  - the reduced system (A - B T^-1 B^T) dx_s = -g_s + B T^-1 g_n gathers
    into a replicated (6S, 6S) dense solve (S is small);
  - dx_n comes back through the factored sweep; a Levenberg-Marquardt
    accept/reject with scale-aware damping guards every step.

Slot conventions: reduced slots carry (t (3,), q (4,)) with a per-DIM free
mask — trajectory IMU slots store gravity in t[0] and the calibration
quaternion in q with dims 1, 2 frozen (their boxplus retraction is then the
ordinary pose retraction), and `grav_clamp` marks slots whose t[0] is
projected to >= 0 after each step (Ceres SetParameterLowerBound,
optimization_problem_3d.cc:444-446). Yaw-only fixed-frame origins freeze
tangent dims 3, 4 (YawOnlyQuaternionPlus). fix_z freezes node dim 2.
Node-chain constraints must couple CONSECUTIVE node slots.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from cartographer_tpu.ops.spa_3d import (
    acceleration_residual_3d,
    constraint_residual_3d,
    rotation_residual_3d,
)
from cartographer_tpu.transform import quaternion as quat


def _empty_i():
    return jnp.zeros((0,), jnp.int32)


def _empty_f(shape=(0,)):
    return jnp.zeros(shape, jnp.float32)


def _empty_b(shape=(0,)):
    return jnp.zeros(shape, bool)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SchurSpaProblem3D:
    """SE(3) SPA problem in reduced/node-partitioned form.

    S reduced slots, N node slots (N even). Binary constraints (C) couple
    reduced slot a_idx with node b_idx. Node-node constraints (D) couple
    node j_idx with j_idx + 1. Gyro rotation constraints (R) couple nodes
    (rot_i, rot_i + 1) and reduced slot rot_traj. Acceleration triplets (A)
    couple nodes (acc_i, acc_i+1, acc_i+2) and reduced slot acc_traj.
    """

    sub_t: jnp.ndarray  # (S, 3)
    sub_q: jnp.ndarray  # (S, 4)
    node_t: jnp.ndarray  # (N, 3)
    node_q: jnp.ndarray  # (N, 4)
    sub_free: jnp.ndarray  # (S, 6) bool per-dim
    node_free: jnp.ndarray  # (N, 6) bool per-dim
    grav_clamp: jnp.ndarray  # (S,) bool: project t[0] >= 0 after steps
    a_idx: jnp.ndarray  # (C,)
    b_idx: jnp.ndarray  # (C,)
    rel_t: jnp.ndarray  # (C, 3) measured a^-1 * b
    rel_q: jnp.ndarray  # (C, 4)
    trans_weight: jnp.ndarray  # (C,)
    rot_weight: jnp.ndarray  # (C,)
    use_huber: jnp.ndarray  # (C,) bool
    valid: jnp.ndarray  # (C,) bool
    j_idx: jnp.ndarray  # (D,)
    nn_rel_t: jnp.ndarray  # (D, 3)
    nn_rel_q: jnp.ndarray  # (D, 4)
    nn_trans_weight: jnp.ndarray  # (D,)
    nn_rot_weight: jnp.ndarray  # (D,)
    nn_valid: jnp.ndarray  # (D,) bool
    rot_i: jnp.ndarray = dataclasses.field(default_factory=_empty_i)  # (R,)
    rot_traj: jnp.ndarray = dataclasses.field(default_factory=_empty_i)
    rot_delta_q: jnp.ndarray = dataclasses.field(
        default_factory=partial(_empty_f, (0, 4)))
    rot_weight_c: jnp.ndarray = dataclasses.field(default_factory=_empty_f)
    rot_valid: jnp.ndarray = dataclasses.field(default_factory=_empty_b)
    acc_i: jnp.ndarray = dataclasses.field(default_factory=_empty_i)  # (A,)
    acc_traj: jnp.ndarray = dataclasses.field(default_factory=_empty_i)
    acc_delta_v: jnp.ndarray = dataclasses.field(
        default_factory=partial(_empty_f, (0, 3)))
    acc_dt1: jnp.ndarray = dataclasses.field(default_factory=_empty_f)
    acc_dt2: jnp.ndarray = dataclasses.field(default_factory=_empty_f)
    acc_weight: jnp.ndarray = dataclasses.field(default_factory=_empty_f)
    acc_valid: jnp.ndarray = dataclasses.field(default_factory=_empty_b)


def _retract(t, q, d6):
    return (t + d6[..., 0:3],
            quat.normalize(quat.multiply(q, quat.from_axis_angle(d6[..., 3:6]))))


def _bin_local(da, db, ta, qa, tb, qb, rel_t, rel_q, tw, rw):
    ta2, qa2 = _retract(ta, qa, da)
    tb2, qb2 = _retract(tb, qb, db)
    return constraint_residual_3d(ta2, qa2, tb2, qb2, rel_t, rel_q, tw, rw)


def _rot_local(d_i, d_j, d_t, qi, qj, cq, dq, w):
    qi2 = quat.normalize(quat.multiply(qi, quat.from_axis_angle(d_i[3:6])))
    qj2 = quat.normalize(quat.multiply(qj, quat.from_axis_angle(d_j[3:6])))
    cq2 = quat.normalize(quat.multiply(cq, quat.from_axis_angle(d_t[3:6])))
    return rotation_residual_3d(qi2, qj2, dq, cq2, w)


def _acc_local(d_i, d_j, d_k, d_t, ti, tj, tk, qj, gv, cq, dv, dt1, dt2, w):
    ti2 = ti + d_i[0:3]
    tk2 = tk + d_k[0:3]
    tj2, qj2 = _retract(tj, qj, d_j)
    gv2 = gv + d_t[0]
    cq2 = quat.normalize(quat.multiply(cq, quat.from_axis_angle(d_t[3:6])))
    return acceleration_residual_3d(ti2, tj2, tk2, qj2, dv, dt1, dt2, w,
                                    gv2, cq2)


def _huber_weights(r, use_huber, valid, huber_scale):
    s2 = jnp.sum(r * r, axis=-1)
    hw = jnp.where(use_huber & (s2 > huber_scale**2),
                   jnp.sqrt(huber_scale / jnp.sqrt(jnp.maximum(s2, 1e-18))),
                   1.0)
    return jnp.where(valid, hw, 0.0)[:, None]


def _residuals(sub_t, sub_q, nod_t, nod_q, p: SchurSpaProblem3D, huber_scale):
    """All four residual families at a state, already masked/weighted.
    Returns a list of (E_i, r_i) residual arrays."""
    out = []
    res_v = jax.vmap(constraint_residual_3d)
    r = res_v(sub_t[p.a_idx], sub_q[p.a_idx], nod_t[p.b_idx], nod_q[p.b_idx],
              p.rel_t, p.rel_q, p.trans_weight, p.rot_weight)
    out.append(r * _huber_weights(r, p.use_huber, p.valid, huber_scale))
    rn = res_v(nod_t[p.j_idx], nod_q[p.j_idx],
               nod_t[p.j_idx + 1], nod_q[p.j_idx + 1],
               p.nn_rel_t, p.nn_rel_q, p.nn_trans_weight, p.nn_rot_weight)
    out.append(rn * jnp.where(p.nn_valid, 1.0, 0.0)[:, None])
    if p.rot_i.shape[0] > 0:
        rr = jax.vmap(rotation_residual_3d)(
            nod_q[p.rot_i], nod_q[p.rot_i + 1], p.rot_delta_q,
            sub_q[p.rot_traj], p.rot_weight_c)
        out.append(rr * jnp.where(p.rot_valid, 1.0, 0.0)[:, None])
    if p.acc_i.shape[0] > 0:
        # dt clamped so zero-padded (invalid) entries cannot produce
        # inf/NaN that poison the masked cost (0 * inf = NaN).
        ra = jax.vmap(acceleration_residual_3d)(
            nod_t[p.acc_i], nod_t[p.acc_i + 1], nod_t[p.acc_i + 2],
            nod_q[p.acc_i + 1], p.acc_delta_v,
            jnp.maximum(p.acc_dt1, 1e-6), jnp.maximum(p.acc_dt2, 1e-6),
            p.acc_weight, sub_t[p.acc_traj, 0], sub_q[p.acc_traj])
        out.append(ra * jnp.where(p.acc_valid, 1.0, 0.0)[:, None])
    return out


def _cost_local(sub_t, sub_q, nod_t, nod_q, p, huber_scale):
    c = jnp.float32(0.0)
    for r in _residuals(sub_t, sub_q, nod_t, nod_q, p, huber_scale):
        c = c + jnp.sum(r * r)
    return c


def _assemble_local(sub_t, sub_q, nod_t, nod_q, p: SchurSpaProblem3D,
                    huber_scale):
    """One device's shard contributions.

    Returns (A (S,6,6) reduced diag blocks, d0/u1/u2 (N,6,6) node band
    [u1[i] couples (i, i+1), u2[i] couples (i, i+2)], g_s (S,6), g_n (N,6),
    and the sparse per-entry B blocks (Bc (E,6,6), ae (E,), be (E,)) —
    never densified)."""
    S = sub_t.shape[0]
    N = nod_t.shape[0]
    zero6 = jnp.zeros(6)
    A = jnp.zeros((S, 6, 6))
    d0 = jnp.zeros((N, 6, 6))
    u1 = jnp.zeros((N, 6, 6))
    u2 = jnp.zeros((N, 6, 6))
    g_s = jnp.zeros((S, 6))
    g_n = jnp.zeros((N, 6))
    b_blocks, b_a, b_b = [], [], []

    # --- binary reduced-node constraints -------------------------------
    axes = (None, None, 0, 0, 0, 0, 0, 0, 0, 0)
    args = (sub_t[p.a_idx], sub_q[p.a_idx], nod_t[p.b_idx], nod_q[p.b_idx],
            p.rel_t, p.rel_q, p.trans_weight, p.rot_weight)
    r = jax.vmap(_bin_local, in_axes=axes)(zero6, zero6, *args)
    w = _huber_weights(r, p.use_huber, p.valid, huber_scale)
    r = r * w
    Ja = jax.vmap(jax.jacfwd(_bin_local, argnums=0), in_axes=axes)(
        zero6, zero6, *args) * w[:, :, None]
    Jb = jax.vmap(jax.jacfwd(_bin_local, argnums=1), in_axes=axes)(
        zero6, zero6, *args) * w[:, :, None]
    A = A.at[p.a_idx].add(jnp.einsum("cri,crj->cij", Ja, Ja))
    d0 = d0.at[p.b_idx].add(jnp.einsum("cri,crj->cij", Jb, Jb))
    g_s = g_s.at[p.a_idx].add(jnp.einsum("cri,cr->ci", Ja, r))
    g_n = g_n.at[p.b_idx].add(jnp.einsum("cri,cr->ci", Jb, r))
    b_blocks.append(jnp.einsum("cri,crj->cij", Ja, Jb))
    b_a.append(p.a_idx)
    b_b.append(p.b_idx)

    # --- consecutive node-node constraints ------------------------------
    nn_args = (nod_t[p.j_idx], nod_q[p.j_idx],
               nod_t[p.j_idx + 1], nod_q[p.j_idx + 1],
               p.nn_rel_t, p.nn_rel_q, p.nn_trans_weight, p.nn_rot_weight)
    rn = jax.vmap(_bin_local, in_axes=axes)(zero6, zero6, *nn_args)
    wn = jnp.where(p.nn_valid, 1.0, 0.0)[:, None]
    rn = rn * wn
    Jj = jax.vmap(jax.jacfwd(_bin_local, argnums=0), in_axes=axes)(
        zero6, zero6, *nn_args) * wn[:, :, None]
    Jk = jax.vmap(jax.jacfwd(_bin_local, argnums=1), in_axes=axes)(
        zero6, zero6, *nn_args) * wn[:, :, None]
    d0 = d0.at[p.j_idx].add(jnp.einsum("cri,crj->cij", Jj, Jj))
    d0 = d0.at[p.j_idx + 1].add(jnp.einsum("cri,crj->cij", Jk, Jk))
    u1 = u1.at[p.j_idx].add(jnp.einsum("cri,crj->cij", Jj, Jk))
    g_n = g_n.at[p.j_idx].add(jnp.einsum("cri,cr->ci", Jj, rn))
    g_n = g_n.at[p.j_idx + 1].add(jnp.einsum("cri,cr->ci", Jk, rn))

    # --- gyro rotation constraints (nodes i, i+1 + trajectory block) ----
    if p.rot_i.shape[0] > 0:
        raxes = (None, None, None, 0, 0, 0, 0, 0)
        rargs = (nod_q[p.rot_i], nod_q[p.rot_i + 1], sub_q[p.rot_traj],
                 p.rot_delta_q, p.rot_weight_c)
        rr = jax.vmap(_rot_local, in_axes=raxes)(zero6, zero6, zero6, *rargs)
        wr = jnp.where(p.rot_valid, 1.0, 0.0)[:, None]
        rr = rr * wr
        Ji, Jjn, Jt = [
            jax.vmap(jax.jacfwd(_rot_local, argnums=n), in_axes=raxes)(
                zero6, zero6, zero6, *rargs) * wr[:, :, None]
            for n in (0, 1, 2)]
        d0 = d0.at[p.rot_i].add(jnp.einsum("cri,crj->cij", Ji, Ji))
        d0 = d0.at[p.rot_i + 1].add(jnp.einsum("cri,crj->cij", Jjn, Jjn))
        u1 = u1.at[p.rot_i].add(jnp.einsum("cri,crj->cij", Ji, Jjn))
        A = A.at[p.rot_traj].add(jnp.einsum("cri,crj->cij", Jt, Jt))
        g_n = g_n.at[p.rot_i].add(jnp.einsum("cri,cr->ci", Ji, rr))
        g_n = g_n.at[p.rot_i + 1].add(jnp.einsum("cri,cr->ci", Jjn, rr))
        g_s = g_s.at[p.rot_traj].add(jnp.einsum("cri,cr->ci", Jt, rr))
        b_blocks.append(jnp.einsum("cri,crj->cij", Jt, Ji))
        b_a.append(p.rot_traj)
        b_b.append(p.rot_i)
        b_blocks.append(jnp.einsum("cri,crj->cij", Jt, Jjn))
        b_a.append(p.rot_traj)
        b_b.append(p.rot_i + 1)

    # --- acceleration triplets (nodes i, i+1, i+2 + trajectory block) ---
    if p.acc_i.shape[0] > 0:
        aaxes = (None, None, None, None, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
        aargs = (nod_t[p.acc_i], nod_t[p.acc_i + 1], nod_t[p.acc_i + 2],
                 nod_q[p.acc_i + 1], sub_t[p.acc_traj, 0], sub_q[p.acc_traj],
                 p.acc_delta_v, jnp.maximum(p.acc_dt1, 1e-6),
                 jnp.maximum(p.acc_dt2, 1e-6), p.acc_weight)
        ra = jax.vmap(_acc_local, in_axes=aaxes)(
            zero6, zero6, zero6, zero6, *aargs)
        wa = jnp.where(p.acc_valid, 1.0, 0.0)[:, None]
        ra = ra * wa
        Jai, Jaj, Jak, Jat = [
            jax.vmap(jax.jacfwd(_acc_local, argnums=n), in_axes=aaxes)(
                zero6, zero6, zero6, zero6, *aargs) * wa[:, :, None]
            for n in (0, 1, 2, 3)]
        d0 = d0.at[p.acc_i].add(jnp.einsum("cri,crj->cij", Jai, Jai))
        d0 = d0.at[p.acc_i + 1].add(jnp.einsum("cri,crj->cij", Jaj, Jaj))
        d0 = d0.at[p.acc_i + 2].add(jnp.einsum("cri,crj->cij", Jak, Jak))
        u1 = u1.at[p.acc_i].add(jnp.einsum("cri,crj->cij", Jai, Jaj))
        u1 = u1.at[p.acc_i + 1].add(jnp.einsum("cri,crj->cij", Jaj, Jak))
        u2 = u2.at[p.acc_i].add(jnp.einsum("cri,crj->cij", Jai, Jak))
        A = A.at[p.acc_traj].add(jnp.einsum("cri,crj->cij", Jat, Jat))
        g_n = g_n.at[p.acc_i].add(jnp.einsum("cri,cr->ci", Jai, ra))
        g_n = g_n.at[p.acc_i + 1].add(jnp.einsum("cri,cr->ci", Jaj, ra))
        g_n = g_n.at[p.acc_i + 2].add(jnp.einsum("cri,cr->ci", Jak, ra))
        g_s = g_s.at[p.acc_traj].add(jnp.einsum("cri,cr->ci", Jat, ra))
        for Jx, off in ((Jai, 0), (Jaj, 1), (Jak, 2)):
            b_blocks.append(jnp.einsum("cri,crj->cij", Jat, Jx))
            b_a.append(p.acc_traj)
            b_b.append(p.acc_i + off)

    Bc = jnp.concatenate(b_blocks, axis=0)
    ae = jnp.concatenate(b_a, axis=0)
    be = jnp.concatenate(b_b, axis=0)
    return A, d0, u1, u2, g_s, g_n, Bc, ae, be


def _block_tridiag_factor(Td, To, bs, eps=1e-9):
    """Block-LU factor of the block-tridiagonal T (lower blocks = To^T);
    `bs` is the block size. Same recurrence as the 2D solver's 3x3 factor."""
    U = jnp.concatenate([To, jnp.zeros((1, bs, bs))], axis=0)
    L = jnp.concatenate(
        [jnp.zeros((1, bs, bs)), jnp.transpose(To, (0, 2, 1))], axis=0)

    def fwd(prev_cinv_u, inp):
        D, Ui, Li = inp
        C = D - Li @ prev_cinv_u
        Cinv = jnp.linalg.inv(C + eps * jnp.eye(bs))
        cinv_u = Cinv @ Ui
        return cinv_u, (Cinv, cinv_u)

    _, (Cinv, CinvU) = jax.lax.scan(fwd, jnp.zeros((bs, bs)), (Td, U, L))
    return Cinv, CinvU, L


def _tridiag_solve_multi(factors, rhs, bs):
    """Solve T X = rhs with a prebuilt factorization; rhs (N, bs, K). ONE
    forward+backward lax.scan regardless of K."""
    Cinv, CinvU, L = factors
    K = rhs.shape[-1]

    def fwd(y_prev, inp):
        Cinv_i, L_i, b_i = inp
        y = Cinv_i @ (b_i - L_i @ y_prev)
        return y, y

    _, ys = jax.lax.scan(fwd, jnp.zeros((bs, K)), (Cinv, L, rhs))

    def back(x_next, inp):
        ciu, y = inp
        x = y - ciu @ x_next
        return x, x

    _, xs = jax.lax.scan(back, jnp.zeros((bs, K)), (CinvU, ys), reverse=True)
    return xs


@lru_cache(maxsize=None)
def _solver_fn(mesh: Mesh, axis, num_iterations: int,
               huber_scale_key: float, damping: float):
    """Process-wide jitted SE(3) Schur solver per (mesh, iterations)."""
    huber_scale0 = huber_scale_key
    axes = axis if isinstance(axis, tuple) else (axis,)

    def psum(x):
        for a in axes:
            x = jax.lax.psum(x, a)
        return x

    shard = P(axes if len(axes) > 1 else axes[0])
    rep = P()
    n_shards = int(np.prod([mesh.shape[a] for a in axes]))

    def solve(problem: SchurSpaProblem3D, wmax):
        S = problem.sub_t.shape[0]
        N = problem.node_t.shape[0]
        N2 = N // 2
        sub_free = problem.sub_free.astype(jnp.float32)  # (S, 6)
        node_free = problem.node_free.astype(jnp.float32)  # (N, 6)
        huber_scale = huber_scale0 / wmax

        def iteration(carry, _):
            s_t, s_q, n_t, n_q, lam = carry
            A, d0, u1, u2, g_s, g_n, Bc, ae, be = _assemble_local(
                s_t, s_q, n_t, n_q, problem, huber_scale)
            cost0 = psum(_cost_local(s_t, s_q, n_t, n_q, problem,
                                     huber_scale))
            # One ICI reduction of the (small) shard contributions per GN
            # iteration; per-constraint B blocks stay shard-local until the
            # sparse all_gather below.
            A, d0, u1, u2, g_s, g_n = (psum(A), psum(d0), psum(u1),
                                       psum(u2), psum(g_s), psum(g_n))

            # Frozen DIMS: zero their rows/cols, unit diagonal, zero rhs.
            A = A * sub_free[:, :, None] * sub_free[:, None, :]
            d0 = d0 * node_free[:, :, None] * node_free[:, None, :]
            nf1 = jnp.concatenate([node_free[1:], jnp.zeros((1, 6))])
            nf2 = jnp.concatenate([node_free[2:], jnp.zeros((2, 6))])
            u1 = u1 * node_free[:, :, None] * nf1[:, None, :]
            u2 = u2 * node_free[:, :, None] * nf2[:, None, :]
            g_s = g_s * sub_free
            g_n = g_n * node_free
            # Scale-aware Levenberg-Marquardt damping; frozen dims get a
            # unit diagonal so the factorization stays nonsingular.
            diag_a = jnp.diagonal(A, axis1=1, axis2=2)
            diag_t = jnp.diagonal(d0, axis1=1, axis2=2)
            add_s = jnp.where(problem.sub_free,
                              lam * jnp.abs(diag_a) + damping, 1.0)
            add_n = jnp.where(problem.node_free,
                              lam * jnp.abs(diag_t) + damping, 1.0)
            A = A + jax.vmap(jnp.diag)(add_s)
            d0 = d0 + jax.vmap(jnp.diag)(add_n)

            # Mask B entries against frozen dims (shard-local), then
            # all_gather the SPARSE blocks + indices — O(E * 36) floats,
            # never the O(S*N) dense cross-term.
            BcM = Bc * sub_free[ae][:, :, None] * node_free[be][:, None, :]

            def gather(x):
                for a in axes:
                    x = jax.lax.all_gather(x, a, tiled=True)
                return x

            Bg = gather(BcM)  # (E, 6, 6)
            aig = gather(ae)
            big = gather(be)

            # Pair consecutive nodes -> 12x12 block-tridiagonal T.
            d0r = d0.reshape(N2, 2, 6, 6)
            u1r = u1.reshape(N2, 2, 6, 6)
            u2r = u2.reshape(N2, 2, 6, 6)
            Td2 = jnp.concatenate([
                jnp.concatenate([d0r[:, 0], u1r[:, 0]], axis=2),
                jnp.concatenate([jnp.transpose(u1r[:, 0], (0, 2, 1)),
                                 d0r[:, 1]], axis=2)], axis=1)  # (N2, 12, 12)
            To2 = jnp.concatenate([
                jnp.concatenate([u2r[:, 0], jnp.zeros((N2, 6, 6))], axis=2),
                jnp.concatenate([u1r[:, 1], u2r[:, 1]], axis=2)],
                axis=1)[:-1]  # (N2-1, 12, 12)
            factors = _block_tridiag_factor(Td2, To2, 12)

            # X = T^-1 [B^T | g_n], COLUMN-SHARDED: device d sweeps only
            # the columns of its own reduced block [d*Sb, (d+1)*Sb).
            dev = jnp.int32(0)
            stride = 1
            for a in axes:
                dev = dev + jax.lax.axis_index(a) * stride
                stride *= mesh.shape[a]
            Sb = S // n_shards
            offset = dev * Sb
            a_loc = aig - offset
            in_block = (a_loc >= 0) & (a_loc < Sb)
            a_loc = jnp.clip(a_loc, 0, Sb - 1)
            BcT = jnp.where(in_block[:, None, None],
                            jnp.transpose(Bg, (0, 2, 1)), 0.0)
            BT = jnp.zeros((N, 6, Sb, 6)).at[big, :, a_loc, :].add(BcT)
            rhs = jnp.concatenate(
                [BT.reshape(N, 6, Sb * 6), g_n[:, :, None]], axis=-1)
            sol = _tridiag_solve_multi(
                factors, rhs.reshape(N2, 12, Sb * 6 + 1), 12)
            sol = sol.reshape(N, 6, Sb * 6 + 1)
            X = sol[:, :, : Sb * 6]  # T^-1 B^T, local columns
            y = sol[:, :, Sb * 6]  # T^-1 g_n (replicated)

            # Reduced system: (A - B X) dx_s = -g_s + B y.
            BX = jnp.zeros((S, 6, Sb * 6)).at[aig].add(
                jnp.einsum("cij,cjk->cik", Bg, X[big]))
            By = jnp.zeros((S, 6)).at[aig].add(
                jnp.einsum("cij,cj->ci", Bg, y[big]))
            rows = (jnp.arange(S)[:, None, None] * 6
                    + jnp.arange(6)[None, :, None])
            cols = (jnp.arange(S)[:, None, None] * 6
                    + jnp.arange(6)[None, None, :])
            A_full = jnp.zeros((S * 6, S * 6)).at[
                jnp.broadcast_to(rows, (S, 6, 6)),
                jnp.broadcast_to(cols, (S, 6, 6))].add(A)
            BX_full = BX.reshape(S * 6, Sb * 6)
            for a in axes:
                BX_full = jax.lax.all_gather(BX_full, a, axis=1, tiled=True)
            S_red = A_full - BX_full
            rhs_red = -(g_s - By).reshape(S * 6)
            dx_s = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(S_red), rhs_red)
            # dx_n = -(y + X dx_s); local columns contribute, psum completes.
            dx_block = jax.lax.dynamic_slice(dx_s, (offset * 6,), (Sb * 6,))
            dx_n = -(y / n_shards + jnp.einsum("nik,k->ni", X, dx_block))
            dx_n = psum(dx_n)

            ds = dx_s.reshape(S, 6) * sub_free
            dn = dx_n * node_free
            cand_s_t, cand_s_q = _retract(s_t, s_q, ds)
            cand_n_t, cand_n_q = _retract(n_t, n_q, dn)
            # Projected step: gravity slots stay >= 0
            # (optimization_problem_3d.cc:444-446).
            cand_s_t = cand_s_t.at[:, 0].set(jnp.where(
                problem.grav_clamp, jnp.maximum(cand_s_t[:, 0], 0.0),
                cand_s_t[:, 0]))
            cost1 = psum(_cost_local(cand_s_t, cand_s_q, cand_n_t,
                                     cand_n_q, problem, huber_scale))
            accept = jnp.isfinite(cost1) & (cost1 <= cost0)
            s_t = jnp.where(accept, cand_s_t, s_t)
            s_q = jnp.where(accept, cand_s_q, s_q)
            n_t = jnp.where(accept, cand_n_t, n_t)
            n_q = jnp.where(accept, cand_n_q, n_q)
            lam = jnp.clip(jnp.where(accept, lam / 3.0, lam * 8.0),
                           1e-8, 1e8)
            return (s_t, s_q, n_t, n_q, lam), None

        (s_t, s_q, n_t, n_q, _), _ = jax.lax.scan(
            iteration,
            (problem.sub_t, problem.sub_q, problem.node_t, problem.node_q,
             jnp.float32(1e-4)), None, length=num_iterations)
        return s_t, s_q, n_t, n_q

    sharded = jax.shard_map(
        solve, mesh=mesh,
        in_specs=(SchurSpaProblem3D(
            sub_t=rep, sub_q=rep, node_t=rep, node_q=rep, sub_free=rep,
            node_free=rep, grav_clamp=rep, a_idx=shard, b_idx=shard,
            rel_t=shard, rel_q=shard, trans_weight=shard, rot_weight=shard,
            use_huber=shard, valid=shard, j_idx=shard, nn_rel_t=shard,
            nn_rel_q=shard, nn_trans_weight=shard, nn_rot_weight=shard,
            nn_valid=shard, rot_i=shard, rot_traj=shard, rot_delta_q=shard,
            rot_weight_c=shard, rot_valid=shard, acc_i=shard,
            acc_traj=shard, acc_delta_v=shard, acc_dt1=shard,
            acc_dt2=shard, acc_weight=shard, acc_valid=shard), rep),
        out_specs=(rep, rep, rep, rep), check_vma=False)
    return jax.jit(sharded)


def solve_spa_3d_schur(
    mesh: Mesh,
    problem: SchurSpaProblem3D,
    num_iterations: int = 50,
    huber_scale: float = 1e1,
    damping: float = 1e-6,
    axis: str = "pairs",
):
    """Returns (sub_t, sub_q, node_t, node_q) optimized.

    Constraint arrays must be divisible by the mesh size along `axis` (pad
    with valid=False). N is padded internally to an even count (the 12x12
    node-pairing) and S to a multiple of the shard count (column-sharded
    cross-term); padded slots are fully frozen and sliced off the result.

    Weights are normalized by their maximum before use (argmin-invariant;
    the Huber threshold rescales identically) so the reference's 1e5-scale
    weights stay conditioned in float32.
    """
    axes = axis if isinstance(axis, tuple) else (axis,)
    n_shards = int(np.prod([mesh.shape[a] for a in axes]))
    S0 = problem.sub_t.shape[0]
    N0 = problem.node_t.shape[0]
    Sp = ((S0 + n_shards - 1) // n_shards) * n_shards
    Np = N0 + (N0 % 2)

    def pad_q(q, n):
        ext = jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1))
        return jnp.concatenate([q, ext])

    if Sp != S0:
        problem = dataclasses.replace(
            problem,
            sub_t=jnp.concatenate([problem.sub_t,
                                   jnp.zeros((Sp - S0, 3))]),
            sub_q=pad_q(problem.sub_q, Sp - S0),
            sub_free=jnp.concatenate([problem.sub_free,
                                      jnp.zeros((Sp - S0, 6), bool)]),
            grav_clamp=jnp.concatenate([problem.grav_clamp,
                                        jnp.zeros(Sp - S0, bool)]))
    if Np != N0:
        problem = dataclasses.replace(
            problem,
            node_t=jnp.concatenate([problem.node_t,
                                    jnp.zeros((Np - N0, 3))]),
            node_q=pad_q(problem.node_q, Np - N0),
            node_free=jnp.concatenate([problem.node_free,
                                       jnp.zeros((Np - N0, 6), bool)]))
    wmax = float(max(
        np.max(np.where(np.asarray(problem.valid),
                        np.asarray(problem.trans_weight), 0.0), initial=0.0),
        np.max(np.where(np.asarray(problem.valid),
                        np.asarray(problem.rot_weight), 0.0), initial=0.0),
        np.max(np.where(np.asarray(problem.nn_valid),
                        np.asarray(problem.nn_trans_weight), 0.0),
               initial=0.0),
        np.max(np.where(np.asarray(problem.nn_valid),
                        np.asarray(problem.nn_rot_weight), 0.0),
               initial=0.0),
        np.max(np.where(np.asarray(problem.rot_valid),
                        np.asarray(problem.rot_weight_c), 0.0), initial=0.0),
        np.max(np.where(np.asarray(problem.acc_valid),
                        np.asarray(problem.acc_weight), 0.0), initial=0.0),
        1e-12))
    problem = dataclasses.replace(
        problem,
        trans_weight=problem.trans_weight / wmax,
        rot_weight=problem.rot_weight / wmax,
        nn_trans_weight=problem.nn_trans_weight / wmax,
        nn_rot_weight=problem.nn_rot_weight / wmax,
        rot_weight_c=problem.rot_weight_c / wmax,
        acc_weight=problem.acc_weight / wmax)
    axis_key = axis if isinstance(axis, str) else tuple(axis)
    fn = _solver_fn(mesh, axis_key, int(num_iterations),
                    float(huber_scale), float(damping))
    s_t, s_q, n_t, n_q = fn(problem, jnp.float32(wmax))
    return s_t[:S0], s_q[:S0], n_t[:N0], n_q[:N0]
