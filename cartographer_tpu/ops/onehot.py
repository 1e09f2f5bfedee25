"""One-hot matmul kernels: gather/scatter-free grid access on the MXU.

TPU gathers and scatters execute near-serially (no hardware vector
gather), which made the direct ports of the reference's per-point loops
(grid scoring, bicubic interpolation, raycast insertion) memory-latency
bound: profiled at ~112 ms per correlative match on a v5e chip. The MXU
reformulation replaces every indexed access with dense linear algebra:

- scoring Σ_p G[cx_p + dx, cy_p + dy] over a shift window becomes a
  *count image* U = P^T Q (P/Q one-hot in x/y, built by iota comparison)
  cross-correlated with G — two matmuls;
- bicubic/bilinear interpolation becomes val = rowsum((W_x G) * W_y) with
  banded weight matrices W (4 Catmull-Rom nonzeros per row) — one matmul;
- scan insertion becomes hit/free count images thresholded to occupancy
  masks — matmuls instead of scatter.

One-hot operands are bf16 (exact for 0/1 and small counts) with f32
accumulation. All functions fall back gracefully on CPU (they are plain XLA
ops), but tests compare them against the gather/scatter reference
implementations for equivalence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def onehot_rows(idx: jnp.ndarray, valid: jnp.ndarray, size: int,
                dtype=jnp.bfloat16) -> jnp.ndarray:
    """(M,) int32 indices -> (M, size) one-hot; invalid/OOB rows are zero."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], size), 1)
    ok = valid & (idx >= 0) & (idx < size)
    return ((iota == idx[:, None]) & ok[:, None]).astype(dtype)


def count_image(cells: jnp.ndarray, valid: jnp.ndarray, size: int) -> jnp.ndarray:
    """(M, 2) integer cells -> (size, size) float32 occurrence counts.

    U[i, j] = #{p : cells[p] == (i, j), valid[p]} computed as P^T Q on the
    MXU — the scatter-free histogram.
    """
    P = onehot_rows(cells[:, 0], valid, size)
    Q = onehot_rows(cells[:, 1], valid, size)
    return jnp.dot(P.T, Q, preferred_element_type=jnp.float32)


def occupancy_mask(cells: jnp.ndarray, valid: jnp.ndarray, size: int) -> jnp.ndarray:
    """(size, size) bool: any valid point in the cell (scatter-free)."""
    return count_image(cells, valid, size) > 0.5


def occupancy_mask_chunked(cells: jnp.ndarray, valid: jnp.ndarray, size: int,
                           chunk: int = 32768) -> jnp.ndarray:
    """occupancy_mask for large M (e.g. raycast samples): accumulates count
    images over sample chunks so the one-hot operands stay within a fixed
    memory budget (chunk * size * 2 bytes each)."""
    m = cells.shape[0]
    if m <= chunk:
        return occupancy_mask(cells, valid, size)
    pad = (-m) % chunk
    cells = jnp.pad(cells, ((0, pad), (0, 0)))
    valid = jnp.pad(valid, (0, pad))
    cells = cells.reshape(-1, chunk, 2)
    valid = valid.reshape(-1, chunk)

    def body(acc, inp):
        c, v = inp
        return acc + count_image(c, v, size), None

    counts, _ = jax.lax.scan(body, jnp.zeros((size, size), jnp.float32),
                             (cells, valid))
    return counts > 0.5


def shifted_window_scores(grid: jnp.ndarray, count_imgs: jnp.ndarray,
                          num_shifts: int) -> jnp.ndarray:
    """Cross-correlate count images with `grid` over a centered square
    shift window.

    Args:
      grid: (S, S) float32 probability grid.
      count_imgs: (T, S, S) per-candidate count images.
      num_shifts: window half-width n; shifts dx, dy in [-n, n].

    Returns: (T, 2n+1, 2n+1) scores[t, a, b] = sum_ij U_t[i, j] *
      grid[i + a - n, j + b - n] (zero outside the grid).
    """
    n = num_shifts
    s = grid.shape[0]
    padded = jnp.pad(grid, n)
    # Stack the (2n+1)^2 shifted copies once; then one big matmul:
    # scores = U_flat @ shifted_flat^T.
    shifts = [padded[a:a + s, b:b + s]
              for a in range(2 * n + 1) for b in range(2 * n + 1)]
    shifted = jnp.stack(shifts).reshape((2 * n + 1) ** 2, s * s)
    flat = count_imgs.reshape(count_imgs.shape[0], s * s)
    scores = jnp.dot(flat, shifted.T, preferred_element_type=jnp.float32)
    return scores.reshape(count_imgs.shape[0], 2 * n + 1, 2 * n + 1)


def _catmull_rom_weights(f: jnp.ndarray):
    f2 = f * f
    f3 = f2 * f
    return (
        0.5 * (-f3 + 2.0 * f2 - f),
        0.5 * (3.0 * f3 - 5.0 * f2 + 2.0),
        0.5 * (-3.0 * f3 + 4.0 * f2 + f),
        0.5 * (f3 - f2),
    )


def _banded_weight_matrix(i0: jnp.ndarray, weights, size: int) -> jnp.ndarray:
    """(N, size) matrix with rows carrying `weights` at columns i0-1..i0+2,
    clamped to the border (flat extrapolation like the gather interpolator)."""
    n = i0.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, size), 1)
    out = jnp.zeros((n, size), jnp.float32)
    for k, w in enumerate(weights):
        col = jnp.clip(i0 + (k - 1), 0, size - 1)
        out = out + jnp.where(iota == col[:, None], w[:, None], 0.0)
    return out


def interp_bicubic_mm(grid: jnp.ndarray, coords: jnp.ndarray,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Bicubic interpolation via banded matmuls; same semantics as
    ops.interp.interp_bicubic (values at cell centers, border-clamped),
    differentiable, MXU-executed.

    coords: (N, 2) continuous cell coordinates.
    dtype: operand dtype of the row matmul. bfloat16 quantizes the grid
      probabilities (and banded weights) to ~0.4% — fine for scan-matching
      residuals, ~4x faster on the v5e MXU than float32 — while the weight
      *positions* and the final accumulation stay exact/f32.
    """
    s0, s1 = grid.shape
    p = coords - 0.5
    i0f = jnp.floor(p[:, 0])
    j0f = jnp.floor(p[:, 1])
    fx = p[:, 0] - i0f
    fy = p[:, 1] - j0f
    # Clip only to keep int32 safe; per-neighbor border clamping below
    # matches the gather interpolator exactly (each of the 4 taps clamps
    # independently).
    i0 = jnp.clip(i0f, -s0 - 4, 2 * s0 + 4).astype(jnp.int32)
    j0 = jnp.clip(j0f, -s1 - 4, 2 * s1 + 4).astype(jnp.int32)
    WX = _banded_weight_matrix(i0, _catmull_rom_weights(fx), s0)  # (N, S0)
    WY = _banded_weight_matrix(j0, _catmull_rom_weights(fy), s1)  # (N, S1)
    left = jnp.dot(WX.astype(dtype), grid.astype(dtype),
                   preferred_element_type=jnp.float32)  # (N, S1)
    return jnp.sum(left * WY, axis=-1)


def table_lookup(table: jnp.ndarray, idx: jnp.ndarray,
                 lo_width: int = 32) -> jnp.ndarray:
    """Exact table[idx] for a small 1D table, gather-free [KERNEL].

    TPU has no vector gather; the naive one-hot contraction costs
    O(idx.size * table.size) VPU work (or an MXU matvec with N=1). This
    factors the one-hot through a two-level (hi, lo) index split:
    a thin f32 matmul row-gathers each index's 32-entry table row, and a
    fused 32-wide compare-select picks the entry — O(idx.size * 32) work.
    ~4x faster than the flat one-hot dot for a 1024-entry table on v5e
    (and bit-exact: the matmul runs at Precision.HIGHEST, and one-hot
    rows make every product exact).

    idx must be in [0, table.size); table.size is padded up to a multiple
    of lo_width.
    """
    n = table.shape[0]
    pad = (-n) % lo_width
    table2 = jnp.pad(table, (0, pad)).reshape(-1, lo_width)
    hi = idx // lo_width
    lo = idx % lo_width
    flat_hi = hi.reshape(-1)
    oh_hi = (flat_hi[:, None]
             == jnp.arange(table2.shape[0], dtype=jnp.int32)[None, :])
    rows = jnp.dot(oh_hi.astype(jnp.float32), table2,
                   precision=jax.lax.Precision.HIGHEST)  # (M, lo_width)
    sel = rows * (lo.reshape(-1)[:, None]
                  == jnp.arange(lo_width, dtype=jnp.int32)[None, :])
    return jnp.sum(sel, axis=-1).reshape(idx.shape)
