"""Pallas kernel tests — require real TPU hardware (Mosaic does not target
the CPU interpreter in these shapes), so they self-skip on the CPU test mesh.
Equivalence against the XLA count-image method is asserted when they run."""

import jax
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pallas correlative kernel targets TPU (Mosaic)")


def test_pallas_matches_mxu():
    import numpy as np
    import jax.numpy as jnp

    from cartographer_tpu.ops.correlative_2d import (
        CorrelativeSearchParams,
        real_time_correlative_match,
    )
    from cartographer_tpu.ops.grid_2d import Grid2D, insert_range_data
    from cartographer_tpu.sensor.point_cloud import PointCloud, RangeData
    from cartographer_tpu.transform.rigid import Rigid2

    N = 1024
    ang = np.linspace(-np.pi, np.pi, N, endpoint=False)
    r = 8 + 1.5 * np.sin(3 * ang)
    pts = jnp.asarray(np.stack([r * np.cos(ang), r * np.sin(ang)], -1), jnp.float32)
    mask = jnp.ones(N, bool)
    grid = Grid2D.create(512, 0.05, np.zeros(2, np.float32))
    cloud = PointCloud(points=pts, mask=mask, intensities=jnp.zeros(N))
    rd = RangeData(origin=jnp.zeros(2), returns=cloud, misses=PointCloud.empty(N, 2))
    grid = insert_range_data(grid, rd)
    cp = CorrelativeSearchParams(max_scan_range=10.0)
    initial = Rigid2.from_xytheta(0.05, -0.03, 0.01)
    s1, p1 = real_time_correlative_match(grid, pts, mask, initial, cp, method="mxu")
    s2, p2 = real_time_correlative_match(grid, pts, mask, initial, cp, method="pallas")
    np.testing.assert_allclose(float(s1), float(s2), atol=5e-3)
    np.testing.assert_allclose(np.asarray(p1.translation),
                               np.asarray(p2.translation), atol=1e-6)
