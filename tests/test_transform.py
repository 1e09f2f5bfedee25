"""Tests for transform/: Rigid2/Rigid3 algebra, quaternion ops, interpolation.

Mirrors the reference's transform tests (rigid_transform_test.cc,
transform_test.cc, transform_interpolation_buffer_test.cc).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartographer_tpu.transform import (
    Rigid2,
    Rigid3,
    TransformInterpolationBuffer,
    embed_3d,
    project_2d,
    quaternion as quat,
)


def rand_rigid2(rng):
    return Rigid2.from_xytheta(rng.uniform(-10, 10), rng.uniform(-10, 10), rng.uniform(-np.pi, np.pi))


def rand_rigid3(rng):
    aa = rng.uniform(-1, 1, 3)
    return Rigid3(jnp.asarray(rng.uniform(-10, 10, 3), jnp.float32), quat.from_axis_angle(jnp.asarray(aa, jnp.float32)))


class TestRigid2:
    def test_identity(self):
        p = jnp.array([[1.0, 2.0]])
        np.testing.assert_allclose(Rigid2.identity().apply(p), p)

    def test_inverse_roundtrip(self):
        rng = np.random.RandomState(0)
        for _ in range(10):
            t = rand_rigid2(rng)
            r = t.compose(t.inverse())
            np.testing.assert_allclose(np.asarray(r.translation), 0, atol=1e-5)
            assert abs(float(r.rotation)) < 1e-5

    def test_compose_matches_sequential_apply(self):
        rng = np.random.RandomState(1)
        a, b = rand_rigid2(rng), rand_rigid2(rng)
        pts = jnp.asarray(rng.uniform(-5, 5, (7, 2)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray((a * b).apply(pts)), np.asarray(a.apply(b.apply(pts))), atol=1e-4)

    def test_batched(self):
        t = Rigid2(jnp.zeros((4, 2)), jnp.full((4,), jnp.pi / 2))
        pts = jnp.tile(jnp.array([[1.0, 0.0]]), (4, 1))
        out = t.apply(pts)
        np.testing.assert_allclose(np.asarray(out), np.tile([[0.0, 1.0]], (4, 1)), atol=1e-6)

    def test_vector_roundtrip(self):
        v = jnp.array([1.0, -2.0, 0.5])
        np.testing.assert_allclose(np.asarray(Rigid2.from_vector(v).to_vector()), np.asarray(v))


class TestQuaternion:
    def test_axis_angle_roundtrip(self):
        # Angles kept < pi: beyond that the canonical roundtrip returns the
        # equivalent rotation with flipped axis.
        rng = np.random.RandomState(2)
        for _ in range(20):
            aa = jnp.asarray(rng.uniform(-1.5, 1.5, 3), jnp.float32)
            np.testing.assert_allclose(
                np.asarray(quat.to_axis_angle(quat.from_axis_angle(aa))), np.asarray(aa), atol=1e-4)

    def test_axis_angle_zero(self):
        aa = jnp.zeros(3)
        q = quat.from_axis_angle(aa)
        np.testing.assert_allclose(np.asarray(q), [1, 0, 0, 0], atol=1e-7)
        # Differentiable through zero.
        g = jax.grad(lambda a: quat.from_axis_angle(a)[0])(aa)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_rotate_matches_matrix(self):
        rng = np.random.RandomState(3)
        for _ in range(10):
            q = quat.from_axis_angle(jnp.asarray(rng.uniform(-2, 2, 3), jnp.float32))
            v = jnp.asarray(rng.uniform(-5, 5, 3), jnp.float32)
            np.testing.assert_allclose(
                np.asarray(quat.rotate(q, v)), np.asarray(quat.to_matrix(q) @ v), atol=1e-5)

    def test_yaw(self):
        q = quat.from_yaw(jnp.array(0.7))
        assert abs(float(quat.get_yaw(q)) - 0.7) < 1e-6

    def test_get_angle(self):
        aa = jnp.array([0.0, 0.0, 1.3])
        assert abs(float(quat.get_angle(quat.from_axis_angle(aa))) - 1.3) < 1e-5

    def test_slerp_endpoints(self):
        a = quat.from_yaw(jnp.array(0.0))
        b = quat.from_yaw(jnp.array(1.0))
        np.testing.assert_allclose(np.asarray(quat.slerp(a, b, 0.0)), np.asarray(a), atol=1e-6)
        np.testing.assert_allclose(np.asarray(quat.slerp(a, b, 1.0)), np.asarray(b), atol=1e-6)
        mid = quat.slerp(a, b, 0.5)
        assert abs(float(quat.get_yaw(mid)) - 0.5) < 1e-5


class TestRigid3:
    def test_inverse_roundtrip(self):
        rng = np.random.RandomState(4)
        for _ in range(10):
            t = rand_rigid3(rng)
            r = t.compose(t.inverse())
            np.testing.assert_allclose(np.asarray(r.translation), 0, atol=1e-4)
            np.testing.assert_allclose(abs(float(r.rotation[0])), 1.0, atol=1e-5)

    def test_compose_apply(self):
        rng = np.random.RandomState(5)
        a, b = rand_rigid3(rng), rand_rigid3(rng)
        pts = jnp.asarray(rng.uniform(-5, 5, (7, 3)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray((a * b).apply(pts)), np.asarray(a.apply(b.apply(pts))), atol=1e-3)

    def test_project_embed(self):
        t2 = Rigid2.from_xytheta(1.0, 2.0, 0.3)
        back = project_2d(embed_3d(t2))
        np.testing.assert_allclose(np.asarray(back.translation), [1.0, 2.0], atol=1e-6)
        assert abs(float(back.rotation) - 0.3) < 1e-6


class TestInterpolationBuffer:
    def test_lookup(self):
        buf = TransformInterpolationBuffer()
        buf.push(0, np.zeros(3), np.array([1.0, 0, 0, 0]))
        buf.push(1_000_000, np.array([2.0, 0, 0]), np.asarray(quat.from_yaw(jnp.array(1.0))))
        assert buf.has(500_000)
        t, q = buf.lookup(500_000)
        np.testing.assert_allclose(t, [1.0, 0, 0], atol=1e-6)
        assert abs(float(quat.get_yaw(jnp.asarray(q))) - 0.5) < 1e-5

    def test_limit(self):
        buf = TransformInterpolationBuffer(buffer_size_limit=2)
        for i in range(5):
            buf.push(i, np.zeros(3), np.array([1.0, 0, 0, 0]))
        assert buf.size == 2
        assert buf.earliest_time == 3

    def test_rejects_old(self):
        buf = TransformInterpolationBuffer()
        buf.push(10, np.zeros(3), np.array([1.0, 0, 0, 0]))
        with pytest.raises(ValueError):
            buf.push(5, np.zeros(3), np.array([1.0, 0, 0, 0]))
