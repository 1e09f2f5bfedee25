"""Distributed sparse pose adjustment over a device mesh [KERNEL x MESH].

TPU equivalent of multi-tier global SLAM (SURVEY.md P5): constraints are
sharded across chips; each chip assembles the normal-equation contributions
of its constraint shard; H and g are reduced with `psum` over ICI and the
(small, dense) solve runs replicated. This is the "distributed Gauss-Newton"
pattern — cross-chip traffic is one (V*3)^2 matrix reduction per iteration
regardless of constraint count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from cartographer_tpu.ops.spa import SpaProblem2D, constraint_residual


def solve_spa_2d_sharded(
    mesh: Mesh,
    problem: SpaProblem2D,
    num_iterations: int = 50,
    huber_scale: float = 1e1,
    damping: float = 1e-6,
    axis: str = "pairs",
) -> jnp.ndarray:
    """Like ops.spa.solve_spa_2d but with constraints sharded over `axis`.

    `problem.poses` / `fixed` are replicated; constraint arrays (C,...) must
    have C divisible by the mesh size (pad with valid=False slots).
    """
    V = problem.poses.shape[0]

    jac_a = jax.vmap(jax.jacfwd(constraint_residual, argnums=0))
    jac_b = jax.vmap(jax.jacfwd(constraint_residual, argnums=1))
    res_v = jax.vmap(constraint_residual)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(),
    )
    def solve(poses0, a_idx, b_idx, rel, tw, rw, use_huber, valid, fixed):
        free_flat = jnp.repeat(~fixed, 3)

        def iteration(poses, _):
            pa = poses[a_idx]
            pb = poses[b_idx]
            r = res_v(pa, pb, rel, tw, rw)
            s = jnp.sum(r * r, axis=-1)
            hw = jnp.where(
                use_huber & (s > huber_scale**2),
                jnp.sqrt(huber_scale / jnp.sqrt(jnp.maximum(s, 1e-12))),
                1.0)
            w = jnp.where(valid, hw, 0.0)[:, None]
            r = r * w
            Ja = jac_a(pa, pb, rel, tw, rw) * w[:, :, None]
            Jb = jac_b(pa, pb, rel, tw, rw) * w[:, :, None]
            J = jnp.concatenate([Ja, Jb], axis=-1)
            JtJ = jnp.einsum("cri,crj->cij", J, J)
            Jtr = jnp.einsum("cri,cr->ci", J, r)
            cols = jnp.concatenate(
                [a_idx[:, None] * 3 + jnp.arange(3)[None, :],
                 b_idx[:, None] * 3 + jnp.arange(3)[None, :]], axis=1)
            H_local = jnp.zeros((V * 3, V * 3), jnp.float32)
            H_local = H_local.at[cols[:, :, None], cols[:, None, :]].add(JtJ)
            g_local = jnp.zeros((V * 3,), jnp.float32).at[cols].add(Jtr)

            # ICI reduction: every chip gets the full normal equations.
            H = jax.lax.psum(H_local, axis)
            g = jax.lax.psum(g_local, axis)

            H = H * (free_flat[:, None] & free_flat[None, :])
            H = H + jnp.diag(jnp.where(free_flat, damping, 1.0))
            g = jnp.where(free_flat, g, 0.0)
            dx = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(H), -g)
            return poses + dx.reshape(V, 3), None

        poses, _ = jax.lax.scan(iteration, poses0, None, length=num_iterations)
        return poses

    return solve(problem.poses, problem.a_idx, problem.b_idx, problem.rel,
                 problem.trans_weight, problem.rot_weight, problem.use_huber,
                 problem.valid, problem.fixed)
