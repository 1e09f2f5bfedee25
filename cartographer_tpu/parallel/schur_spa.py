"""Schur-complement sparse pose adjustment, sharded over a device mesh.

The SPA normal equations have the classic two-block structure (SURVEY.md
P6; the reference solves it with Ceres' sparse solver):

    H = [ A   B  ]   A: submap-submap block-diagonal (no direct
        [ B^T T  ]      submap-submap constraints),
                     T: node-node block-TRIDIAGONAL (consecutive-node
                        local-SLAM/odometry chains are the only node-node
                        coupling),
                     B: submap-node coupling from INTRA/INTER constraints.

Eliminating the (many) node blocks against the (few) submap blocks:

    (A - B T^-1 B^T) dx_s = g_s - B T^-1 g_n      (3S x 3S, small, dense)
    dx_n = T^-1 (g_n - B^T dx_s)                  (block-Thomas sweep)

Distribution: constraints are sharded over the mesh axis; each device
assembles its shard's contributions to A, B, T, g and they are psum-reduced
over ICI. The block-tridiagonal factorization (a lax.scan of 3x3 block
ops), the small dense Cholesky, and the back-substitution run replicated —
cross-chip traffic per GN iteration is one reduction of
O(S^2 + S*N + N) floats instead of the full (3(S+N))^2 system.

Constraint layout: `a_idx` indexes submap slots [0, S), `b_idx` node slots
[0, N) for submap-node constraints; node-node constraints must be
consecutive (node j, node j+1) and are passed separately.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from cartographer_tpu.ops.spa import constraint_residual


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SchurSpaProblem2D:
    """SPA problem in submap/node-partitioned form.

    S submap slots, N node slots. Submap-node constraints (C slots) carry
    a_idx in [0, S) and b_idx in [0, N). Node-node constraints (D slots)
    couple node j_idx with node j_idx + 1 (consecutive only).
    """

    submap_poses: jnp.ndarray  # (S, 3)
    node_poses: jnp.ndarray  # (N, 3)
    a_idx: jnp.ndarray  # (C,) submap slot
    b_idx: jnp.ndarray  # (C,) node slot
    rel: jnp.ndarray  # (C, 3)
    trans_weight: jnp.ndarray  # (C,)
    rot_weight: jnp.ndarray  # (C,)
    use_huber: jnp.ndarray  # (C,) bool
    valid: jnp.ndarray  # (C,) bool
    j_idx: jnp.ndarray  # (D,) node slot (couples j, j+1)
    nn_rel: jnp.ndarray  # (D, 3)
    nn_trans_weight: jnp.ndarray  # (D,)
    nn_rot_weight: jnp.ndarray  # (D,)
    nn_valid: jnp.ndarray  # (D,) bool
    submap_fixed: jnp.ndarray  # (S,) bool
    node_fixed: jnp.ndarray  # (N,) bool


def _assemble_local(sub, nod, p: SchurSpaProblem2D, huber_scale):
    """One device's shard contributions (A, B, T_diag, T_off, g_s, g_n)."""
    S = sub.shape[0]
    N = nod.shape[0]
    jac_a = jax.vmap(jax.jacfwd(constraint_residual, argnums=0))
    jac_b = jax.vmap(jax.jacfwd(constraint_residual, argnums=1))
    res_v = jax.vmap(constraint_residual)

    # --- submap-node constraints ---
    pa = sub[p.a_idx]
    pb = nod[p.b_idx]
    r = res_v(pa, pb, p.rel, p.trans_weight, p.rot_weight)
    s2 = jnp.sum(r * r, axis=-1)
    hw = jnp.where(p.use_huber & (s2 > huber_scale**2),
                   jnp.sqrt(huber_scale / jnp.sqrt(jnp.maximum(s2, 1e-12))),
                   1.0)
    w = jnp.where(p.valid, hw, 0.0)[:, None]
    r = r * w
    Ja = jac_a(pa, pb, p.rel, p.trans_weight, p.rot_weight) * w[:, :, None]
    Jb = jac_b(pa, pb, p.rel, p.trans_weight, p.rot_weight) * w[:, :, None]
    A = jnp.zeros((S, 3, 3)).at[p.a_idx].add(jnp.einsum("cri,crj->cij", Ja, Ja))
    Td = jnp.zeros((N, 3, 3)).at[p.b_idx].add(jnp.einsum("cri,crj->cij", Jb, Jb))
    # B as dense (S*3, N*3): scatter per-constraint 3x3 cross blocks.
    Bm = jnp.zeros((S, 3, N, 3)).at[p.a_idx, :, p.b_idx, :].add(
        jnp.einsum("cri,crj->cij", Ja, Jb))
    g_s = jnp.zeros((S, 3)).at[p.a_idx].add(jnp.einsum("cri,cr->ci", Ja, r))
    g_n = jnp.zeros((N, 3)).at[p.b_idx].add(jnp.einsum("cri,cr->ci", Jb, r))

    # --- consecutive node-node constraints ---
    pj = nod[p.j_idx]
    pk = nod[p.j_idx + 1]
    rn = res_v(pj, pk, p.nn_rel, p.nn_trans_weight, p.nn_rot_weight)
    wn = jnp.where(p.nn_valid, 1.0, 0.0)[:, None]
    rn = rn * wn
    Jj = jac_a(pj, pk, p.nn_rel, p.nn_trans_weight, p.nn_rot_weight) * wn[:, :, None]
    Jk = jac_b(pj, pk, p.nn_rel, p.nn_trans_weight, p.nn_rot_weight) * wn[:, :, None]
    Td = Td.at[p.j_idx].add(jnp.einsum("cri,crj->cij", Jj, Jj))
    Td = Td.at[p.j_idx + 1].add(jnp.einsum("cri,crj->cij", Jk, Jk))
    To = jnp.zeros((N - 1, 3, 3)).at[p.j_idx].add(
        jnp.einsum("cri,crj->cij", Jj, Jk))
    g_n = g_n.at[p.j_idx].add(jnp.einsum("cri,cr->ci", Jj, rn))
    g_n = g_n.at[p.j_idx + 1].add(jnp.einsum("cri,cr->ci", Jk, rn))
    return A, Bm, Td, To, g_s, g_n


def _block_tridiag_solve(Td, To, rhs):
    """Solve T x = rhs for block-tridiagonal T (block-Thomas as lax.scan).

    Td: (N, 3, 3) diagonal blocks, To: (N-1, 3, 3) upper blocks (lower =
    To^T), rhs: (N, 3, K).
    """
    N = Td.shape[0]
    To_full = jnp.concatenate([To, jnp.zeros((1, 3, 3))], axis=0)

    def fwd(carry, inp):
        prev_cinv_u, prev_y = carry  # C_{i-1}^-1 U_{i-1}, y_{i-1}
        D, U, b, L = inp  # L = To[i-1]^T (lower block into row i)
        C = D - L @ prev_cinv_u
        Cinv = jnp.linalg.inv(C + 1e-9 * jnp.eye(3))
        y = Cinv @ (b - L @ prev_y)
        return (Cinv @ U, y), (Cinv @ U, y)

    L_full = jnp.concatenate(
        [jnp.zeros((1, 3, 3)), jnp.transpose(To, (0, 2, 1))], axis=0)
    K = rhs.shape[-1]
    (_, _), (cinv_u, ys) = jax.lax.scan(
        fwd, (jnp.zeros((3, 3)), jnp.zeros((3, K))),
        (Td, To_full, rhs, L_full))

    def back(carry, inp):
        x_next = carry
        ciu, y = inp
        x = y - ciu @ x_next
        return x, x

    _, xs = jax.lax.scan(back, jnp.zeros((3, K)), (cinv_u, ys), reverse=True)
    return xs  # (N, 3, K)


def solve_spa_2d_schur(
    mesh: Mesh,
    problem: SchurSpaProblem2D,
    num_iterations: int = 50,
    huber_scale: float = 1e1,
    damping: float = 1e-6,
    axis: str = "pairs",
):
    """Returns (submap_poses (S, 3), node_poses (N, 3)) optimized.

    Constraint arrays (C and D slots) must be divisible by the mesh size
    along `axis` (pad with valid=False).
    """
    S = problem.submap_poses.shape[0]
    N = problem.node_poses.shape[0]

    shard = P(axis)
    rep = P()

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(rep, rep, shard, shard, shard, shard, shard, shard, shard,
                  shard, shard, shard, shard, shard, rep, rep),
        out_specs=(rep, rep),
    )
    def solve(sub0, nod0, a_idx, b_idx, rel, tw, rw, hub, valid,
              j_idx, nn_rel, nn_tw, nn_rw, nn_valid, sub_fixed, node_fixed):
        local = SchurSpaProblem2D(
            submap_poses=sub0, node_poses=nod0, a_idx=a_idx, b_idx=b_idx,
            rel=rel, trans_weight=tw, rot_weight=rw, use_huber=hub,
            valid=valid, j_idx=j_idx, nn_rel=nn_rel, nn_trans_weight=nn_tw,
            nn_rot_weight=nn_rw, nn_valid=nn_valid,
            submap_fixed=sub_fixed, node_fixed=node_fixed)
        sub_free = (~sub_fixed).astype(jnp.float32)[:, None]
        node_free = (~node_fixed).astype(jnp.float32)[:, None]

        def iteration(carry, _):
            sub, nod = carry
            local_i = dataclasses.replace(
                local, submap_poses=sub, node_poses=nod)
            A, Bm, Td, To, g_s, g_n = _assemble_local(
                sub, nod, local_i, huber_scale)
            # ICI reduction of the shard contributions.
            A = jax.lax.psum(A, axis)
            Bm = jax.lax.psum(Bm, axis)
            Td = jax.lax.psum(Td, axis)
            To = jax.lax.psum(To, axis)
            g_s = jax.lax.psum(g_s, axis)
            g_n = jax.lax.psum(g_n, axis)

            # Frozen slots: zero their rows/cols, unit diagonal, zero rhs.
            fm_s = sub_free[:, :, None] * jnp.ones((S, 3, 3))
            A = A * fm_s * jnp.transpose(fm_s, (0, 2, 1))
            fm_n = node_free[:, :, None] * jnp.ones((N, 3, 3))
            Td = Td * fm_n * jnp.transpose(fm_n, (0, 2, 1))
            To = To * fm_n[:-1] * jnp.transpose(fm_n[1:], (0, 2, 1))
            Bm2 = (Bm * sub_free[:, :, None, None]
                   * node_free[None, None, :, :])
            g_s2 = g_s * sub_free
            g_n2 = g_n * node_free
            A = A + jnp.eye(3)[None] * jnp.where(
                sub_fixed[:, None, None], 1.0, damping)
            Td = Td + jnp.eye(3)[None] * jnp.where(
                node_fixed[:, None, None], 1.0, damping)

            # Schur elimination of the node blocks.
            Bflat = Bm2.reshape(S * 3, N * 3)
            # X = T^-1 B^T : (N*3, S*3); y = T^-1 g_n.
            rhs = jnp.concatenate(
                [Bflat.T.reshape(N, 3, S * 3), g_n2.reshape(N, 3, 1)], axis=-1)
            sol = _block_tridiag_solve(Td, To, rhs)
            X = sol[:, :, : S * 3].reshape(N * 3, S * 3)
            y = sol[:, :, S * 3].reshape(N * 3)

            # A as block-diagonal (S*3, S*3).
            A_full = jnp.zeros((S * 3, S * 3))
            rows = (jnp.arange(S)[:, None, None] * 3
                    + jnp.arange(3)[None, :, None])
            cols_ = (jnp.arange(S)[:, None, None] * 3
                     + jnp.arange(3)[None, None, :])
            A_full = A_full.at[
                jnp.broadcast_to(rows, (S, 3, 3)),
                jnp.broadcast_to(cols_, (S, 3, 3))].add(A)
            S_red = A_full - Bflat @ X  # (S*3, S*3) on the MXU
            rhs_red = (g_s2.reshape(S * 3) - Bflat @ y)
            dx_s = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(S_red), -rhs_red)
            # Back-substitute the node blocks: dx_n = -(y + ... ):
            # T dx_n = -(g_n - B^T ... careful with signs:
            # Normal equations: [A B; B^T T][dx_s; dx_n] = -[g_s; g_n]
            # => dx_n = T^-1 (-g_n - B^T dx_s) = -(y + X dx_s).
            dx_n = -(y + X @ dx_s)
            sub = sub + dx_s.reshape(S, 3) * sub_free
            nod = nod + dx_n.reshape(N, 3) * node_free
            return (sub, nod), None

        (sub, nod), _ = jax.lax.scan(
            iteration, (sub0, nod0), None, length=num_iterations)
        return sub, nod

    return solve(problem.submap_poses, problem.node_poses, problem.a_idx,
                 problem.b_idx, problem.rel, problem.trans_weight,
                 problem.rot_weight, problem.use_huber, problem.valid,
                 problem.j_idx, problem.nn_rel, problem.nn_trans_weight,
                 problem.nn_rot_weight, problem.nn_valid,
                 problem.submap_fixed, problem.node_fixed)
