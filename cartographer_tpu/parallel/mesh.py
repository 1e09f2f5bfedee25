"""Mesh helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int = None, axis_name: str = "pairs") -> Mesh:
    """1D device mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))
