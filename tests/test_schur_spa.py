"""Schur-complement distributed SPA vs the single-chip dense solve."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartographer_tpu.ops.spa import SpaProblem2D, solve_spa_2d
from cartographer_tpu.parallel.mesh import make_mesh
from cartographer_tpu.parallel.schur_spa import (
    SchurSpaProblem2D,
    solve_spa_2d_schur,
)


def _random_graph(S=6, N=40, seed=0):
    """Noisy loop trajectory: N nodes on a circle, S submaps, INTRA/INTER
    submap-node constraints + consecutive node-node constraints."""
    rng = np.random.RandomState(seed)
    # Ground truth.
    t = np.linspace(0, 2 * np.pi, N, endpoint=False)
    gt_nodes = np.stack([4 * np.cos(t), 4 * np.sin(t), t + np.pi / 2], -1)
    own = (np.arange(N) * S) // N
    gt_subs = np.stack([gt_nodes[np.where(own == s)[0][0]] for s in range(S)])

    def rel(a, b):
        c, s_ = np.cos(a[2]), np.sin(a[2])
        d = b[:2] - a[:2]
        return np.array([c * d[0] + s_ * d[1], -s_ * d[0] + c * d[1],
                         b[2] - a[2]])

    a_idx, b_idx, rels = [], [], []
    for n in range(N):
        for s in {own[n], (own[n] + 1) % S if n % 7 == 0 else own[n]}:
            a_idx.append(s)
            b_idx.append(n)
            rels.append(rel(gt_subs[s], gt_nodes[n])
                        + rng.randn(3) * [0.01, 0.01, 0.002])
    j_idx = np.arange(N - 1)
    nn_rels = np.stack([rel(gt_nodes[j], gt_nodes[j + 1])
                        + rng.randn(3) * [0.01, 0.01, 0.002]
                        for j in j_idx])

    # Noisy initial values.
    init_nodes = gt_nodes + rng.randn(N, 3) * [0.2, 0.2, 0.05]
    init_subs = gt_subs + rng.randn(S, 3) * [0.2, 0.2, 0.05]
    init_subs[0] = gt_subs[0]

    C = len(a_idx)
    capC = 64
    capD = 64
    schur = SchurSpaProblem2D(
        submap_poses=jnp.asarray(init_subs, jnp.float32),
        node_poses=jnp.asarray(init_nodes, jnp.float32),
        a_idx=jnp.asarray(np.pad(a_idx, (0, capC - C)), jnp.int32),
        b_idx=jnp.asarray(np.pad(b_idx, (0, capC - C)), jnp.int32),
        rel=jnp.asarray(np.pad(np.asarray(rels, np.float32),
                               ((0, capC - C), (0, 0)))),
        trans_weight=jnp.asarray(np.pad(np.full(C, 20.0, np.float32),
                                        (0, capC - C))),
        rot_weight=jnp.asarray(np.pad(np.full(C, 10.0, np.float32),
                                      (0, capC - C))),
        use_huber=jnp.zeros(capC, bool),
        valid=jnp.asarray(np.arange(capC) < C),
        j_idx=jnp.asarray(np.pad(j_idx, (0, capD - len(j_idx))), jnp.int32),
        nn_rel=jnp.asarray(np.pad(nn_rels.astype(np.float32),
                                  ((0, capD - len(j_idx)), (0, 0)))),
        nn_trans_weight=jnp.asarray(
            np.pad(np.full(len(j_idx), 20.0, np.float32),
                   (0, capD - len(j_idx)))),
        nn_rot_weight=jnp.asarray(
            np.pad(np.full(len(j_idx), 10.0, np.float32),
                   (0, capD - len(j_idx)))),
        nn_valid=jnp.asarray(np.arange(capD) < len(j_idx)),
        submap_fixed=jnp.asarray(np.arange(S) == 0),
        node_fixed=jnp.zeros(N, bool),
    )
    # Equivalent flat problem: slots = [submaps | nodes].
    flat = SpaProblem2D(
        poses=jnp.concatenate([schur.submap_poses, schur.node_poses]),
        a_idx=jnp.concatenate([schur.a_idx, schur.j_idx + S]),
        b_idx=jnp.concatenate([schur.b_idx + S, schur.j_idx + S + 1]),
        rel=jnp.concatenate([schur.rel, schur.nn_rel]),
        trans_weight=jnp.concatenate([schur.trans_weight, schur.nn_trans_weight]),
        rot_weight=jnp.concatenate([schur.rot_weight, schur.nn_rot_weight]),
        use_huber=jnp.zeros(capC + capD, bool),
        valid=jnp.concatenate([schur.valid, schur.nn_valid]),
        fixed=jnp.concatenate([schur.submap_fixed, schur.node_fixed]),
    )
    return schur, flat, gt_subs, gt_nodes


class TestSchurSpa:
    def test_matches_dense_solve_on_mesh(self):
        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        schur, flat, gt_subs, gt_nodes = _random_graph()
        mesh = make_mesh()
        sub, nod = solve_spa_2d_schur(mesh, schur, num_iterations=30)
        ref = np.asarray(solve_spa_2d(flat, num_iterations=30))
        S = sub.shape[0]
        np.testing.assert_allclose(np.asarray(sub), ref[:S], atol=2e-3)
        np.testing.assert_allclose(np.asarray(nod), ref[S:], atol=2e-3)
        # And it actually solved the problem (close to ground truth).
        err = np.linalg.norm(np.asarray(nod)[:, :2] - gt_nodes[:, :2], axis=1)
        assert float(err.mean()) < 0.05

    def test_single_device_mesh(self):
        schur, flat, _, _ = _random_graph(seed=3)
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("pairs",))
        sub, nod = solve_spa_2d_schur(mesh, schur, num_iterations=25)
        ref = np.asarray(solve_spa_2d(flat, num_iterations=25))
        np.testing.assert_allclose(np.asarray(sub), ref[:sub.shape[0]], atol=2e-3)
