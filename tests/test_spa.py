"""SPA solver tests (reference: spa_cost_function_2d_test.cc,
optimization_problem_2d + pose_graph_2d_test.cc fake constraint chains)."""

import jax
import jax.numpy as jnp
import numpy as np

from cartographer_tpu.ops.spa import (
    SpaProblem2D,
    constraint_residual,
    solve_spa_2d,
)


def build_problem(poses, constraints, fixed_slots, max_c=64):
    V = poses.shape[0]
    C = len(constraints)
    a = np.zeros(max_c, np.int32)
    b = np.zeros(max_c, np.int32)
    rel = np.zeros((max_c, 3), np.float32)
    tw = np.zeros(max_c, np.float32)
    rw = np.zeros(max_c, np.float32)
    hub = np.zeros(max_c, bool)
    valid = np.zeros(max_c, bool)
    for i, (ai, bi, r, t_w, r_w, h) in enumerate(constraints):
        a[i], b[i], rel[i], tw[i], rw[i], hub[i], valid[i] = ai, bi, r, t_w, r_w, h, True
    fixed = np.zeros(V, bool)
    fixed[fixed_slots] = True
    return SpaProblem2D(
        poses=jnp.asarray(poses, jnp.float32), a_idx=jnp.asarray(a),
        b_idx=jnp.asarray(b), rel=jnp.asarray(rel), trans_weight=jnp.asarray(tw),
        rot_weight=jnp.asarray(rw), use_huber=jnp.asarray(hub),
        valid=jnp.asarray(valid), fixed=jnp.asarray(fixed))


def rel_pose(pa, pb):
    """Ground-truth a^-1 * b as [x, y, theta]."""
    c, s = np.cos(pa[2]), np.sin(pa[2])
    d = pb[:2] - pa[:2]
    return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1], pb[2] - pa[2]])


class TestResidual:
    def test_zero_at_exact(self):
        pa = jnp.array([1.0, 2.0, 0.3])
        pb = jnp.array([2.0, 2.5, 0.8])
        rel = jnp.asarray(rel_pose(np.asarray(pa), np.asarray(pb)), jnp.float32)
        r = constraint_residual(pa, pb, rel, 1.0, 1.0)
        np.testing.assert_allclose(np.asarray(r), 0, atol=1e-5)

    def test_angle_wrap(self):
        pa = jnp.array([0.0, 0.0, 3.0])
        pb = jnp.array([0.0, 0.0, -3.0])
        # True relative angle is +0.28 (wrapping through pi).
        rel = jnp.array([0.0, 0.0, 2 * np.pi - 6.0])
        r = constraint_residual(pa, pb, rel, 1.0, 1.0)
        np.testing.assert_allclose(float(r[2]), 0.0, atol=1e-5)


class TestSolve:
    def test_chain_recovers_ground_truth(self):
        # Ground truth: 6 poses on an arc; constraints = exact relatives;
        # initial values heavily perturbed.
        rng = np.random.RandomState(0)
        gt = np.stack([
            np.linspace(0, 5, 6), 0.3 * np.sin(np.linspace(0, 2, 6)),
            np.linspace(0, 0.8, 6)], -1)
        constraints = [
            (i, i + 1, rel_pose(gt[i], gt[i + 1]), 30.0, 30.0, False)
            for i in range(5)]
        init = gt + rng.normal(0, 0.4, gt.shape)
        init[0] = gt[0]
        problem = build_problem(init, constraints, fixed_slots=[0])
        out = np.asarray(solve_spa_2d(problem, num_iterations=20))
        np.testing.assert_allclose(out, gt, atol=1e-3)

    def test_loop_closure_distributes_error(self):
        # A drifted chain plus one exact loop-closure constraint back to the
        # start: optimization must spread the accumulated error.
        n = 8
        gt = np.stack([np.cos(np.linspace(0, 2 * np.pi, n, endpoint=False)),
                       np.sin(np.linspace(0, 2 * np.pi, n, endpoint=False)),
                       np.linspace(0, 2 * np.pi, n, endpoint=False) + np.pi / 2], -1)
        # Odometry constraints with systematic drift.
        constraints = []
        for i in range(n - 1):
            r = rel_pose(gt[i], gt[i + 1])
            r[0] *= 1.1  # 10% scale drift
            constraints.append((i, i + 1, r, 20.0, 20.0, False))
        # Loop closure: exact relative from last to first.
        constraints.append((n - 1, 0, rel_pose(gt[n - 1], gt[0]), 50.0, 50.0, True))
        problem = build_problem(gt.copy(), constraints, fixed_slots=[0])
        out = np.asarray(solve_spa_2d(problem, num_iterations=30))
        # Loop closure must hold: relative pose between last and first ~ truth.
        got = rel_pose(out[-1], out[0])
        want = rel_pose(gt[-1], gt[0])
        np.testing.assert_allclose(got, want, atol=0.05)

    def test_fixed_poses_unmoved(self):
        gt = np.array([[0.0, 0, 0], [1, 0, 0], [2, 0, 0]])
        constraints = [(0, 1, np.array([1.2, 0, 0]), 10.0, 10.0, False),
                       (1, 2, np.array([0.8, 0, 0]), 10.0, 10.0, False)]
        problem = build_problem(gt.copy(), constraints, fixed_slots=[0])
        out = np.asarray(solve_spa_2d(problem, num_iterations=10))
        np.testing.assert_allclose(out[0], gt[0], atol=1e-6)
        assert abs(out[1][0] - 1.2) < 1e-3

    def test_jittable(self):
        gt = np.array([[0.0, 0, 0], [1, 0, 0]])
        constraints = [(0, 1, np.array([1.1, 0, 0]), 10.0, 10.0, False)]
        problem = build_problem(gt.copy(), constraints, fixed_slots=[0])
        f = jax.jit(lambda p: solve_spa_2d(p, num_iterations=5))
        out = np.asarray(f(problem))
        assert abs(out[1][0] - 1.1) < 1e-3
