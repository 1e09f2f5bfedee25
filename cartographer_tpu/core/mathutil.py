"""Small math helpers (host + device safe).

Equivalent of the reference `cartographer/common/math.h`.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def clamp(value, low, high):
    return jnp.clip(value, low, high) if hasattr(value, "shape") else max(low, min(high, value))


def round_to_int(value: float) -> int:
    return int(math.floor(value + 0.5)) if value >= 0 else -int(math.floor(-value + 0.5))


def power(base: float, exponent: int) -> float:
    return base**exponent


def normalize_angle_difference(angle):
    """Wrap an angle (or array of angles) into (-pi, pi].

    Matches common::NormalizeAngleDifference (cartographer/common/math.h).
    Works on Python floats and jnp arrays.
    """
    if hasattr(angle, "shape"):
        return angle - 2.0 * jnp.pi * jnp.floor((angle + jnp.pi) / (2.0 * jnp.pi))
    while angle > math.pi:
        angle -= 2.0 * math.pi
    while angle <= -math.pi:
        angle += 2.0 * math.pi
    return angle
