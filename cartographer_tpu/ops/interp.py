"""Differentiable grid interpolation (bicubic 2D, trilinear 3D) [KERNEL].

Reference equivalents: the Ceres BiCubicInterpolator used by
occupied_space_cost_function_2d.cc (with its kPadding border trick) and the
trilinear InterpolatedGrid of mapping/internal/3d/scan_matching/interpolated_grid.h.

Values live at cell centers (cell i covers [i, i+1) in cell units, center at
i + 0.5). Evaluation clamps to the grid border (flat extrapolation), which is
what Ceres' interpolator does after Cartographer pads the grid; out-of-map
points therefore see a flat max-cost plateau rather than a hard error.
All functions are jax.grad-differentiable — the Gauss-Newton matcher
differentiates through them instead of hand-coding Jacobians.
"""

from __future__ import annotations

import jax.numpy as jnp


def _catmull_rom_weights(f: jnp.ndarray):
    """Cubic Hermite (Catmull-Rom) weights for fraction f in [0, 1)."""
    f2 = f * f
    f3 = f2 * f
    w0 = 0.5 * (-f3 + 2.0 * f2 - f)
    w1 = 0.5 * (3.0 * f3 - 5.0 * f2 + 2.0)
    w2 = 0.5 * (-3.0 * f3 + 4.0 * f2 + f)
    w3 = 0.5 * (f3 - f2)
    return w0, w1, w2, w3


def interp_bicubic(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bicubic interpolation of `grid` (S0, S1) at `coords` (..., 2).

    Coords are continuous cell coordinates (same convention as
    Grid2D.world_to_cell_continuous: value of cell (i, j) sits at
    (i + 0.5, j + 0.5)).
    """
    s0, s1 = grid.shape
    p = coords - 0.5
    i0 = jnp.floor(p[..., 0])
    j0 = jnp.floor(p[..., 1])
    fx = p[..., 0] - i0
    fy = p[..., 1] - j0
    i0 = i0.astype(jnp.int32)
    j0 = j0.astype(jnp.int32)

    wx = _catmull_rom_weights(fx)
    wy = _catmull_rom_weights(fy)

    out = jnp.zeros(coords.shape[:-1], grid.dtype)
    for di in range(-1, 3):
        row = jnp.zeros(coords.shape[:-1], grid.dtype)
        ii = jnp.clip(i0 + di, 0, s0 - 1)
        for dj in range(-1, 3):
            jj = jnp.clip(j0 + dj, 0, s1 - 1)
            row = row + wy[dj + 1] * grid[ii, jj]
        out = out + wx[di + 1] * row
    return out


def interp_bilinear(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation of `grid` (S0, S1) at `coords` (..., 2)."""
    s0, s1 = grid.shape
    p = coords - 0.5
    i0 = jnp.floor(p[..., 0])
    j0 = jnp.floor(p[..., 1])
    fx = p[..., 0] - i0
    fy = p[..., 1] - j0
    i0 = i0.astype(jnp.int32)
    j0 = j0.astype(jnp.int32)
    out = jnp.zeros(coords.shape[:-1], grid.dtype)
    for di, wi in ((0, 1.0 - fx), (1, fx)):
        ii = jnp.clip(i0 + di, 0, s0 - 1)
        for dj, wj in ((0, 1.0 - fy), (1, fy)):
            jj = jnp.clip(j0 + dj, 0, s1 - 1)
            out = out + wi * wj * grid[ii, jj]
    return out


def interp_trilinear(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Trilinear interpolation of `grid` (S0, S1, S2) at `coords` (..., 3).

    Equivalent of InterpolatedGrid::GetProbability
    (mapping/internal/3d/scan_matching/interpolated_grid.h).
    """
    s0, s1, s2 = grid.shape
    p = coords - 0.5
    base = jnp.floor(p)
    f = p - base
    base = base.astype(jnp.int32)
    out = jnp.zeros(coords.shape[:-1], grid.dtype)
    for di in range(2):
        wi = f[..., 0] if di else (1.0 - f[..., 0])
        ii = jnp.clip(base[..., 0] + di, 0, s0 - 1)
        for dj in range(2):
            wj = f[..., 1] if dj else (1.0 - f[..., 1])
            jj = jnp.clip(base[..., 1] + dj, 0, s1 - 1)
            for dk in range(2):
                wk = f[..., 2] if dk else (1.0 - f[..., 2])
                kk = jnp.clip(base[..., 2] + dk, 0, s2 - 1)
                out = out + wi * wj * wk * grid[ii, jj, kk]
    return out
