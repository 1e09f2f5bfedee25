"""Quaternion math, batched, (w, x, y, z) convention.

Backs Rigid3 (reference: cartographer/transform/rigid_transform.h which uses
Eigen::Quaterniond) plus the angle-axis helpers from
cartographer/transform/transform.h (GetAngle/GetYaw/RotationQuaternionToAngleAxisVector/
AngleAxisVectorToRotationQuaternion). All ops broadcast over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def identity(batch_shape=()) -> jnp.ndarray:
    q = jnp.zeros(batch_shape + (4,))
    return q.at[..., 0].set(1.0)


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by quaternions q (..., 4); broadcasts."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def from_axis_angle(aa: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: axis-angle vector (..., 3) -> quaternion (..., 4).

    Safe at aa == 0 (Taylor branch), so it is jax.grad-differentiable through
    the origin — required by the SE(3) Gauss-Newton retraction.
    """
    angle_sq = jnp.sum(aa * aa, axis=-1)
    angle = jnp.sqrt(jnp.maximum(angle_sq, 1e-32))
    half = 0.5 * angle
    small = angle_sq < 1e-12
    # sin(half)/angle with Taylor fallback 0.5 - angle^2/48.
    k = jnp.where(small, 0.5 - angle_sq / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - angle_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w[..., None], k[..., None] * aa], axis=-1)


def to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Log map: quaternion (..., 4) -> axis-angle vector (..., 3), angle in [0, pi]."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)  # canonical hemisphere
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    vnorm_sq = jnp.sum(q[..., 1:4] ** 2, axis=-1)
    vnorm = jnp.sqrt(jnp.maximum(vnorm_sq, 1e-32))
    angle = 2.0 * jnp.arctan2(vnorm, w)
    small = vnorm_sq < 1e-12
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12), angle / vnorm)
    return scale[..., None] * q[..., 1:4]


def get_yaw(q: jnp.ndarray) -> jnp.ndarray:
    """Yaw of rotation (rotation of the x-axis projected to the xy-plane).

    Matches transform::GetYaw (cartographer/transform/transform.h:43-48).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # direction = R @ [1,0,0]; yaw = atan2(dir_y, dir_x)
    dir_x = 1 - 2 * (y * y + z * z)
    dir_y = 2 * (x * y + w * z)
    return jnp.arctan2(dir_y, dir_x)


def get_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Absolute rotation angle in [0, pi] (transform::GetAngle)."""
    w = jnp.abs(q[..., 0])
    vnorm = jnp.linalg.norm(q[..., 1:4], axis=-1)
    return 2.0 * jnp.arctan2(vnorm, w)


def from_yaw(yaw: jnp.ndarray) -> jnp.ndarray:
    half = 0.5 * jnp.asarray(yaw)
    zeros = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1)


def slerp(a: jnp.ndarray, b: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical interpolation between quaternions (shortest arc)."""
    t = jnp.asarray(t)
    dot = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(dot < 0, -b, b)
    dot = jnp.abs(dot)
    # Linear fallback when nearly parallel.
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    near = sin_theta < 1e-6
    t_ = t[..., None] if t.ndim < dot.ndim else t
    wa = jnp.where(near, 1.0 - t_, jnp.sin((1.0 - t_) * theta) / jnp.where(near, 1.0, sin_theta))
    wb = jnp.where(near, t_, jnp.sin(t_ * theta) / jnp.where(near, 1.0, sin_theta))
    return normalize(wa * a + wb * b)


def from_two_vectors(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Quaternion rotating unit-ish vector a onto b (Eigen FromTwoVectors)."""
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    c = jnp.cross(a, b)
    w = 1.0 + jnp.sum(a * b, axis=-1)
    # Degenerate (a == -b): pick an arbitrary orthogonal axis.
    degenerate = w[..., None] < 1e-8
    ortho = jnp.cross(a, jnp.where(jnp.abs(a[..., 0:1]) < 0.9, jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0])))
    q = jnp.concatenate([w[..., None], c], axis=-1)
    q_deg = jnp.concatenate([jnp.zeros_like(w[..., None]), ortho], axis=-1)
    return normalize(jnp.where(degenerate, q_deg, q))
