"""ICP/GICP/NDT matcher tests (fork parity: pclomp + icp_example)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cartographer_tpu.ops.icp import (
    IcpParams,
    NdtParams,
    gicp_match,
    icp_match,
    ndt_match,
)
from cartographer_tpu.transform import Rigid3, quaternion as quat

from test_ops_3d import make_environment_3d


def perturbed_pair(seed=0, t=(0.3, -0.2, 0.1), aa=(0.0, 0.0, 0.1), n=400):
    world = make_environment_3d(num=n, seed=seed)
    true_pose = Rigid3(jnp.asarray(t, jnp.float32),
                       quat.from_axis_angle(jnp.asarray(aa, jnp.float32)))
    source = np.asarray(true_pose.inverse().apply(jnp.asarray(world)))
    return (jnp.asarray(source), jnp.ones(n, bool),
            jnp.asarray(world), jnp.ones(n, bool), true_pose)


class TestIcp:
    def test_recovers_pose(self):
        src, sm, tgt, tm, true_pose = perturbed_pair()
        pose, fitness, rmse = icp_match(
            src, sm, tgt, tm, Rigid3.identity(), IcpParams(max_iterations=40))
        np.testing.assert_allclose(
            np.asarray(pose.translation), np.asarray(true_pose.translation),
            atol=0.08)
        assert float(fitness) > 0.9
        assert float(rmse) < 0.15

    def test_identity_stays(self):
        world = make_environment_3d(num=300, seed=1)
        pts = jnp.asarray(world)
        m = jnp.ones(300, bool)
        pose, fitness, rmse = icp_match(pts, m, pts, m, Rigid3.identity())
        assert float(rmse) < 1e-3
        np.testing.assert_allclose(np.asarray(pose.translation), 0, atol=1e-3)


class TestGicp:
    def test_recovers_pose(self):
        src, sm, tgt, tm, true_pose = perturbed_pair(seed=2)
        pose, fitness, rmse = gicp_match(
            src, sm, tgt, tm, Rigid3.identity())
        np.testing.assert_allclose(
            np.asarray(pose.translation), np.asarray(true_pose.translation),
            atol=0.12)
        assert float(fitness) > 0.85


class TestNdt:
    def test_recovers_pose(self):
        src, sm, tgt, tm, true_pose = perturbed_pair(
            seed=3, t=(0.25, -0.15, 0.05), aa=(0.0, 0.0, 0.05), n=600)
        pose, cost = ndt_match(
            src, sm, tgt, tm, Rigid3.identity(),
            NdtParams(resolution=1.0, max_iterations=25, grid_extent=24))
        err = np.linalg.norm(
            np.asarray(pose.translation) - np.asarray(true_pose.translation))
        assert err < 0.15, err
