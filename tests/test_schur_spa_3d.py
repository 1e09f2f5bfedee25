"""SE(3) Schur-complement SPA solver tests (parallel/schur_spa_3d.py).

Reference parity target: the sparse Ceres solve of
optimization_problem_3d.cc:566-567 — here the node blocks (banded by
consecutive-node chains + IMU acceleration triplets) are eliminated against
the reduced blocks, with constraints sharded over the mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cartographer_tpu.parallel.schur_spa_3d import (
    SchurSpaProblem3D,
    solve_spa_3d_schur,
)
from cartographer_tpu.transform import nquat


def _inv(t, q):
    iq = nquat.conjugate(q)
    return nquat.rotate(iq, -t), iq


def _comp(a, b):
    return (a[0] + nquat.rotate(a[1], b[0]),
            nquat.normalize(nquat.multiply(a[1], b[1])))


def _padi(a, c):
    o = np.zeros(c, np.int32)
    o[: len(a)] = a
    return jnp.asarray(o)


def _padf(a, c, w=None):
    s = (c,) if w is None else (c, w)
    o = np.zeros(s, np.float32)
    if len(a):
        o[: len(a)] = np.asarray(a, np.float32)
    return jnp.asarray(o)


def _padq(a, c):
    o = np.zeros((c, 4), np.float32)
    o[:, 0] = 1.0
    if len(a):
        o[: len(a)] = a
    return jnp.asarray(o)


def _valid(n, c):
    return jnp.asarray(np.arange(c) < n)


def _wavy_problem(N=32, S=4, seed=0, noise=0.02):
    """Submap-node chain with loop closures on a 3D wavy ground truth."""
    rng = np.random.RandomState(seed)
    t = np.arange(N) * 0.3
    gt_t = np.stack([t, 0.5 * np.sin(t), 0.2 * np.cos(t)], -1)
    gt_q = np.stack([nquat.normalize(nquat.from_axis_angle(np.array(
        [0.05 * np.sin(k), 0.04 * np.cos(k), 0.3 * k / N])))
        for k in range(N)])
    own = (np.arange(N) * S) // N
    sub_t = np.stack([gt_t[np.where(own == s)[0][0]] for s in range(S)])
    sub_q = np.stack([gt_q[np.where(own == s)[0][0]] for s in range(S)])

    a_idx, b_idx, rel_t, rel_q, tw, rw, hub = [], [], [], [], [], [], []
    for n in range(N):
        r = _comp(_inv(sub_t[own[n]], sub_q[own[n]]), (gt_t[n], gt_q[n]))
        a_idx.append(own[n])
        b_idx.append(n)
        rel_t.append(r[0])
        rel_q.append(r[1])
        tw.append(30.0)
        rw.append(20.0)
        hub.append(False)
    for n in range(0, N, 7):
        s = (own[n] + S // 2) % S
        r = _comp(_inv(sub_t[s], sub_q[s]), (gt_t[n], gt_q[n]))
        a_idx.append(s)
        b_idx.append(n)
        rel_t.append(r[0])
        rel_q.append(r[1])
        tw.append(30.0)
        rw.append(20.0)
        hub.append(True)
    j_idx, nn_t, nn_q = [], [], []
    for j in range(N - 1):
        r = _comp(_inv(gt_t[j], gt_q[j]), (gt_t[j + 1], gt_q[j + 1]))
        j_idx.append(j)
        nn_t.append(r[0])
        nn_q.append(r[1])

    drift = np.cumsum(rng.randn(N, 3) * noise, axis=0)
    init_t = gt_t + drift
    init_q = np.stack([nquat.normalize(gt_q[k] + rng.randn(4) * 0.01)
                       for k in range(N)])
    init_sub_t = sub_t + drift[(np.arange(S) * N) // S]
    init_sub_t[0] = sub_t[0]
    sub_free = np.ones((S, 6), bool)
    sub_free[0] = False

    C, D = len(a_idx), len(j_idx)
    Cc = ((max(C, 8) + 7) // 8) * 8
    Dc = ((max(D, 8) + 7) // 8) * 8
    prob = SchurSpaProblem3D(
        sub_t=jnp.asarray(init_sub_t, jnp.float32),
        sub_q=jnp.asarray(sub_q, jnp.float32),
        node_t=jnp.asarray(init_t, jnp.float32),
        node_q=jnp.asarray(init_q, jnp.float32),
        sub_free=jnp.asarray(sub_free),
        node_free=jnp.ones((N, 6), bool),
        grav_clamp=jnp.zeros(S, bool),
        a_idx=_padi(a_idx, Cc), b_idx=_padi(b_idx, Cc),
        rel_t=_padf(rel_t, Cc, 3), rel_q=_padq(rel_q, Cc),
        trans_weight=_padf(tw, Cc), rot_weight=_padf(rw, Cc),
        use_huber=jnp.asarray(np.pad(np.asarray(hub, bool), (0, Cc - C))),
        valid=_valid(C, Cc),
        j_idx=_padi(j_idx, Dc), nn_rel_t=_padf(nn_t, Dc, 3),
        nn_rel_q=_padq(nn_q, Dc),
        nn_trans_weight=_padf([30.0] * D, Dc),
        nn_rot_weight=_padf([20.0] * D, Dc), nn_valid=_valid(D, Dc))
    return prob, gt_t, gt_q, init_t


class TestRecovery:
    def test_recovers_ground_truth_single_device(self):
        prob, gt_t, gt_q, init_t = _wavy_problem()
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("pairs",))
        s_t, s_q, n_t, n_q = solve_spa_3d_schur(mesh, prob,
                                                num_iterations=25)
        ate = np.sqrt(np.mean(np.sum((np.asarray(n_t) - gt_t) ** 2, -1)))
        init_ate = np.sqrt(np.mean(np.sum((init_t - gt_t) ** 2, -1)))
        assert ate < 0.02 * init_ate

    def test_mesh_sharded_matches_single_device(self):
        prob, gt_t, gt_q, _ = _wavy_problem()
        mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("pairs",))
        mesh8 = Mesh(np.asarray(jax.devices()), ("pairs",))
        _, _, n1, q1 = solve_spa_3d_schur(mesh1, prob, num_iterations=15)
        _, _, n8, q8 = solve_spa_3d_schur(mesh8, prob, num_iterations=15)
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n8), atol=2e-3)

    def test_odd_node_count_pads(self):
        prob, gt_t, _, _ = _wavy_problem(N=31)
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("pairs",))
        _, _, n_t, _ = solve_spa_3d_schur(mesh, prob, num_iterations=25)
        ate = np.sqrt(np.mean(np.sum((np.asarray(n_t) - gt_t) ** 2, -1)))
        assert ate < 0.01


class TestImuTerms:
    def _base(self, N, S):
        return dict(
            sub_t=jnp.zeros((S, 3)), sub_q=_padq([], S),
            node_t=jnp.zeros((N, 3)), node_q=_padq([], N),
            sub_free=jnp.zeros((S, 6), bool),
            node_free=jnp.ones((N, 6), bool),
            grav_clamp=jnp.zeros(S, bool),
            a_idx=_padi([], 8), b_idx=_padi([], 8),
            rel_t=_padf([], 8, 3), rel_q=_padq([], 8),
            trans_weight=_padf([], 8), rot_weight=_padf([], 8),
            use_huber=jnp.zeros(8, bool), valid=jnp.zeros(8, bool),
            j_idx=_padi([], 8), nn_rel_t=_padf([], 8, 3),
            nn_rel_q=_padq([], 8), nn_trans_weight=_padf([], 8),
            nn_rot_weight=_padf([], 8), nn_valid=jnp.zeros(8, bool))

    def test_acceleration_triplet_constrains_middle_node(self):
        """Mirror of test_imu_residuals_3d triplet test via the Schur path:
        a constant-velocity IMU triplet pulls the middle node to the
        midpoint (AccelerationCostFunction3D)."""
        dt = 0.5
        init = np.array([[0.0, 0, 0], [0.8, 0.2, -0.1], [1.0, 0, 0]],
                        np.float32)
        dv = np.array([0.0, 0.0, 9.806 * dt], np.float32)
        kw = self._base(3, 1)
        kw.update(
            sub_t=jnp.asarray([[9.806, 0, 0]], jnp.float32),
            node_t=jnp.asarray(init),
            node_free=jnp.asarray(
                np.array([[False] * 6, [True] * 6, [False] * 6])),
            grav_clamp=jnp.asarray([True]),
            j_idx=_padi([0, 1], 8), nn_rel_t=_padf([[0, 0, 0]] * 2, 8, 3),
            nn_rel_q=_padq([[1, 0, 0, 0]] * 2, 8),
            nn_trans_weight=_padf([0.0, 0.0], 8),
            nn_rot_weight=_padf([100.0, 100.0], 8), nn_valid=_valid(2, 8),
            acc_i=_padi([0], 8), acc_traj=_padi([0], 8),
            acc_delta_v=_padf([dv], 8, 3),
            acc_dt1=_padf([dt], 8), acc_dt2=_padf([dt], 8),
            acc_weight=_padf([50.0], 8), acc_valid=_valid(1, 8))
        prob = SchurSpaProblem3D(**kw)
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("pairs",))
        _, _, n_t, _ = solve_spa_3d_schur(mesh, prob, num_iterations=30)
        np.testing.assert_allclose(np.asarray(n_t)[1], [0.5, 0, 0],
                                   atol=0.02)

    def test_rotation_constraint_pulls_orientation(self):
        """Gyro rotation constraint (RotationCostFunction3D) between two
        nodes + identity calibration recovers the measured delta yaw."""
        delta = nquat.from_yaw(0.4)
        init_q = np.stack([np.array([1.0, 0, 0, 0]),
                           nquat.normalize(np.array([1.0, 0, 0, 0.01]))])
        kw = self._base(2, 1)
        kw.update(
            node_q=jnp.asarray(init_q, jnp.float32),
            node_free=jnp.asarray(np.array([[False] * 6, [True] * 6])),
            rot_i=_padi([0], 8), rot_traj=_padi([0], 8),
            rot_delta_q=_padq([delta], 8),
            rot_weight_c=_padf([50.0], 8), rot_valid=_valid(1, 8))
        prob = SchurSpaProblem3D(**kw)
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("pairs",))
        _, _, _, n_q = solve_spa_3d_schur(mesh, prob, num_iterations=30)
        # residual vec(q_j^-1 q_i calib delta calib^-1) = 0 => q_j = delta
        yaw = nquat.get_yaw(np.asarray(n_q[1], np.float64))
        assert abs(yaw - 0.4) < 0.01

    def test_gravity_learned_with_clamp(self):
        """A free gravity slot converges to the measured specific-force
        scale; the lower-bound projection keeps it nonnegative
        (optimization_problem_3d.cc:444-446)."""
        dt = 0.5
        g_true = 9.5
        gt = np.array([[0.0, 0, 0], [0.5, 0, 0], [1.0, 0, 0]], np.float32)
        dv = np.array([0.0, 0.0, g_true * dt], np.float32)
        kw = self._base(3, 1)
        sub_free = np.zeros((1, 6), bool)
        sub_free[0, 0] = True  # gravity free, calibration frozen
        kw.update(
            sub_t=jnp.asarray([[9.9, 0, 0]], jnp.float32),
            sub_free=jnp.asarray(sub_free),
            node_t=jnp.asarray(gt),
            node_free=jnp.zeros((3, 6), bool),  # poses pinned
            grav_clamp=jnp.asarray([True]),
            acc_i=_padi([0], 8), acc_traj=_padi([0], 8),
            acc_delta_v=_padf([dv], 8, 3),
            acc_dt1=_padf([dt], 8), acc_dt2=_padf([dt], 8),
            acc_weight=_padf([50.0], 8), acc_valid=_valid(1, 8))
        prob = SchurSpaProblem3D(**kw)
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("pairs",))
        s_t, _, _, _ = solve_spa_3d_schur(mesh, prob, num_iterations=30)
        assert abs(float(s_t[0, 0]) - g_true) < 0.02


class TestMasks:
    def test_fix_z_keeps_node_z(self):
        prob, gt_t, _, init_t = _wavy_problem()
        import dataclasses
        nf = np.ones((prob.node_t.shape[0], 6), bool)
        nf[:, 2] = False
        prob = dataclasses.replace(prob, node_free=jnp.asarray(nf))
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("pairs",))
        _, _, n_t, _ = solve_spa_3d_schur(mesh, prob, num_iterations=10)
        np.testing.assert_allclose(np.asarray(n_t)[:, 2], init_t[:, 2],
                                   atol=1e-6)
