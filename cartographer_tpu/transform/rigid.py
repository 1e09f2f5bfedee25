"""Rigid2 / Rigid3: batched SE(2)/SE(3) transforms as JAX pytrees.

Equivalent of `cartographer/transform/rigid_transform.h` (Rigid2<T>/Rigid3<T>)
and `transform.h` (Project2D/Embed3D), but arrays-of-structs: a Rigid2 whose
fields have leading batch dims represents a whole batch of transforms, so
scan-match candidate sets and trajectory segments move through one fused op.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from cartographer_tpu.transform import quaternion as quat


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Rigid2:
    """SE(2): translation (..., 2) and rotation angle (...,) in radians."""

    translation: jnp.ndarray
    rotation: jnp.ndarray

    @staticmethod
    def identity(batch_shape: Tuple[int, ...] = ()) -> "Rigid2":
        return Rigid2(jnp.zeros(batch_shape + (2,)), jnp.zeros(batch_shape))

    @staticmethod
    def from_xytheta(x, y, theta) -> "Rigid2":
        return Rigid2(jnp.stack([jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)], axis=-1),
                      jnp.asarray(theta, jnp.float32))

    @staticmethod
    def from_vector(v: jnp.ndarray) -> "Rigid2":
        """(..., 3) [x, y, theta] -> Rigid2."""
        return Rigid2(v[..., 0:2], v[..., 2])

    def to_vector(self) -> jnp.ndarray:
        return jnp.concatenate([self.translation, self.rotation[..., None]], axis=-1)

    @staticmethod
    def translation_only(t: jnp.ndarray) -> "Rigid2":
        return Rigid2(jnp.asarray(t), jnp.zeros(jnp.asarray(t).shape[:-1]))

    @staticmethod
    def rotation_only(theta) -> "Rigid2":
        theta = jnp.asarray(theta)
        return Rigid2(jnp.zeros(theta.shape + (2,)), theta)

    def rotation_matrix(self) -> jnp.ndarray:
        c, s = jnp.cos(self.rotation), jnp.sin(self.rotation)
        return jnp.stack([jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2)

    def apply(self, points: jnp.ndarray) -> jnp.ndarray:
        """Transform points (..., N, 2) (or (..., 2)) by this transform."""
        c, s = jnp.cos(self.rotation), jnp.sin(self.rotation)
        x, y = points[..., 0], points[..., 1]
        if points.ndim > self.rotation.ndim + 1:
            c, s = c[..., None], s[..., None]
            t = self.translation[..., None, :]
        else:
            t = self.translation
        rx = c * x - s * y
        ry = s * x + c * y
        return jnp.stack([rx, ry], axis=-1) + t

    def compose(self, other: "Rigid2") -> "Rigid2":
        """self * other (apply other first, then self)."""
        return Rigid2(self.apply(other.translation), self.rotation + other.rotation)

    def __mul__(self, other: "Rigid2") -> "Rigid2":
        return self.compose(other)

    def inverse(self) -> "Rigid2":
        inv_rot = -self.rotation
        c, s = jnp.cos(inv_rot), jnp.sin(inv_rot)
        tx, ty = -self.translation[..., 0], -self.translation[..., 1]
        return Rigid2(jnp.stack([c * tx - s * ty, s * tx + c * ty], axis=-1), inv_rot)

    def normalized(self) -> "Rigid2":
        """Rotation wrapped into (-pi, pi]."""
        r = self.rotation - 2.0 * jnp.pi * jnp.floor((self.rotation + jnp.pi) / (2.0 * jnp.pi))
        return Rigid2(self.translation, r)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Rigid3:
    """SE(3): translation (..., 3) and rotation quaternion (..., 4) (w,x,y,z)."""

    translation: jnp.ndarray
    rotation: jnp.ndarray

    @staticmethod
    def identity(batch_shape: Tuple[int, ...] = ()) -> "Rigid3":
        return Rigid3(jnp.zeros(batch_shape + (3,)), quat.identity(batch_shape))

    @staticmethod
    def translation_only(t: jnp.ndarray) -> "Rigid3":
        t = jnp.asarray(t, jnp.float32)
        return Rigid3(t, quat.identity(t.shape[:-1]))

    @staticmethod
    def rotation_only(q: jnp.ndarray) -> "Rigid3":
        q = jnp.asarray(q)
        return Rigid3(jnp.zeros(q.shape[:-1] + (3,)), q)

    def apply(self, points: jnp.ndarray) -> jnp.ndarray:
        """Transform points (..., N, 3) (or (..., 3)) by this transform."""
        if points.ndim > self.translation.ndim:
            q = self.rotation[..., None, :]
            t = self.translation[..., None, :]
        else:
            q, t = self.rotation, self.translation
        return quat.rotate(q, points) + t

    def compose(self, other: "Rigid3") -> "Rigid3":
        return Rigid3(
            self.apply(other.translation),
            quat.normalize(quat.multiply(self.rotation, other.rotation)),
        )

    def __mul__(self, other: "Rigid3") -> "Rigid3":
        return self.compose(other)

    def inverse(self) -> "Rigid3":
        inv_q = quat.conjugate(self.rotation)
        return Rigid3(quat.rotate(inv_q, -self.translation), inv_q)


def project_2d(pose: Rigid3) -> Rigid2:
    """SE(3) -> SE(2) by dropping z and taking yaw (transform::Project2D)."""
    return Rigid2(pose.translation[..., 0:2], quat.get_yaw(pose.rotation))


def embed_3d(pose: Rigid2) -> Rigid3:
    """SE(2) -> SE(3) with z = 0 and yaw-only rotation (transform::Embed3D)."""
    zeros = jnp.zeros(pose.rotation.shape + (1,))
    t3 = jnp.concatenate([pose.translation, zeros], axis=-1)
    return Rigid3(t3, quat.from_yaw(pose.rotation))
