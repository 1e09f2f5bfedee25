"""Fixed-iteration Levenberg-Marquardt for small pose problems [KERNEL].

This is the TPU-native replacement for the reference's per-scan Ceres solves
(ceres_scan_matcher_2d.cc / ceres_scan_matcher_3d.cc): the parameter space is
tiny (3 for SE(2), 6 for SE(3) tangent), residual counts are a few hundred,
so each iteration is one Jacobian (via jax.jacfwd through the interpolated
grid), one small normal-equation solve, and a gated update — fully unrolled
under jit with static iteration count, no host round-trips.

Supports manifold optimization through a `retract` function (boxplus), which
replaces Ceres' local parameterizations (e.g. quaternion tangent updates).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def lm_solve(
    residual_fn: Callable,
    x0,
    retract_fn: Callable = None,
    tangent_dim: int = None,
    num_iterations: int = 20,
    init_lambda: float = 1e-4,
    lambda_up: float = 4.0,
    lambda_down: float = 0.5,
    min_diagonal: float = 1e-6,
    function_tolerance: float = 1e-6,  # Ceres Solver::Options default
    nonmonotonic: bool = False,
):
    """Minimize 0.5 * ||residual_fn(x)||^2 with LM.

    Args:
      residual_fn: x -> residuals (R,). Must be jacfwd-differentiable.
      x0: initial parameters. A flat (P,) vector, or any pytree when
        `retract_fn` is given.
      retract_fn: (x, delta (tangent_dim,)) -> x. Defaults to x + delta.
      tangent_dim: dimension of the tangent space (defaults to len(x0)).
      num_iterations: static max LM iteration count (Ceres max_num_iterations).
      function_tolerance: relative cost-change convergence threshold (Ceres
        function_tolerance); the while_loop exits early on convergence, which
        typically halves the work vs fixed iterations. Pass None/0 for a
        fixed-count scan.
      nonmonotonic: Ceres use_nonmonotonic_steps — accept finite uphill
        steps (escaping shallow ridges) while tracking and returning the
        best parameters seen.

    Returns:
      (x, final_cost, summary) where summary has the initial cost and the
      accepted-step count.
    """
    if retract_fn is None:
        retract_fn = lambda x, d: x + d
        if tangent_dim is None:
            tangent_dim = x0.shape[-1]
    elif tangent_dim is None:
        raise ValueError("tangent_dim required with a custom retract_fn")

    def cost(x):
        r = residual_fn(x)
        return 0.5 * jnp.sum(r * r)

    def local_residual(delta, x):
        return residual_fn(retract_fn(x, delta))

    zero = jnp.zeros((tangent_dim,), jnp.float32)

    def step(x, lam, current_cost, best_x, best_cost):
        r = residual_fn(x)
        J = jax.jacfwd(local_residual)(zero, x)  # (R, P)
        H = J.T @ J
        g = J.T @ r
        damped = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), min_diagonal))
        delta = -jnp.linalg.solve(damped, g)
        x_new = retract_fn(x, delta)
        new_cost = cost(x_new)
        finite = jnp.all(jnp.isfinite(delta)) & jnp.isfinite(new_cost)
        improved = (new_cost < current_cost) & finite
        # Nonmonotonic (Ceres use_nonmonotonic_steps): the iterate may take
        # finite uphill steps; the best iterate is tracked separately.
        accept = finite if nonmonotonic else improved
        x = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), x, x_new)
        lam = jnp.where(improved, lam * lambda_down, lam * lambda_up)
        improvement = jnp.where(
            improved, (current_cost - new_cost) / jnp.maximum(current_cost, 1e-30), 1.0)
        current_cost = jnp.where(accept, new_cost, current_cost)
        is_best = finite & (new_cost < best_cost)
        best_x = jax.tree_util.tree_map(
            lambda a, b: jnp.where(is_best, b, a), best_x, x_new)
        best_cost = jnp.where(is_best, new_cost, best_cost)
        return x, lam, current_cost, best_x, best_cost, accept, improvement

    c0 = cost(x0)
    if not function_tolerance:
        def scan_step(carry, _):
            x, lam, current, bx, bc = carry
            x, lam, current, bx, bc, accept, _ = step(x, lam, current, bx, bc)
            return (x, lam, current, bx, bc), accept

        (x, _, final_cost, best_x, best_cost), accepts = jax.lax.scan(
            scan_step, (x0, jnp.float32(init_lambda), c0, x0, c0), None,
            length=num_iterations)
        num_accepted = jnp.sum(accepts.astype(jnp.int32))
    else:
        def cond(carry):
            _, _, _, _, _, it, converged, _ = carry
            return (it < num_iterations) & ~converged

        def body(carry):
            x, lam, current, bx, bc, it, _, accepted = carry
            x, lam, current, bx, bc, accept, improvement = step(
                x, lam, current, bx, bc)
            converged = accept & (improvement < function_tolerance) \
                & (improvement >= 0)
            return (x, lam, current, bx, bc, it + 1, converged,
                    accepted + accept.astype(jnp.int32))

        x, _, final_cost, best_x, best_cost, _, _, num_accepted = \
            jax.lax.while_loop(
                cond, body,
                (x0, jnp.float32(init_lambda), c0, x0, c0, jnp.int32(0),
                 jnp.bool_(False), jnp.int32(0)))
    if nonmonotonic:
        x, final_cost = best_x, best_cost
    summary = {
        "initial_cost": c0,
        "final_cost": final_cost,
        "num_accepted_steps": num_accepted,
    }
    return x, final_cost, summary
