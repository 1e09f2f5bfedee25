"""Fused correlative scoring as a Pallas TPU kernel [KERNEL].

The XLA count-image formulation (ops/correlative_2d._scores_mxu) is
HBM-bandwidth bound: per angle it writes the (N, S) one-hot operands and the
(S, S) count image U to HBM and reads them back (~9 ms for 141 angles x 8
trajectories at S=512 on v5e). This kernel keeps everything on-chip:

  - the padded probability grid (bf16) stays resident in VMEM for the call;
  - per angle, one-hots are generated straight into VMEM scratch by iota
    comparison and U = P^T Q runs on the MXU into a VMEM count image;
  - the (2n+1)^2 window scores are VPU dot-products of that count image
    against statically-shifted windows of the resident grid.

The only HBM traffic is the discretized cells in (~0.5 MB) and scores out
(~100 KB). Scores are raw probability sums over in-bounds points (bf16
product rounding, like the XLA path's bf16 matmuls); the caller normalizes
and applies the out-of-bounds correction (the cheap in-bounds count is
computed outside the kernel).

Mosaic constraints honored: >=2-D intermediates, 2-D iota, whole-block
output stores, no bool reshapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cx_ref, cy_ref, mask_ref, padded_ref, out_ref,
            p_scratch, q_scratch, u_scratch, *, num_shifts: int, size: int,
            angles_per_block: int, num_points: int, out_width: int):
    w = 2 * num_shifts + 1

    def one_angle(a, _):
        cx = cx_ref[pl.ds(a, 1), :].T  # (N, 1) int32
        cy = cy_ref[pl.ds(a, 1), :].T
        m = mask_ref[:, :]  # (N, 1) int32
        valid = ((cx >= 0) & (cx < size) & (cy >= 0) & (cy < size)
                 & (m > 0))  # (N, 1) bool
        iota = jax.lax.broadcasted_iota(jnp.int32, (num_points, size), 1)
        p_scratch[:, :] = jnp.where((iota == cx) & valid, 1.0, 0.0
                                    ).astype(jnp.bfloat16)
        q_scratch[:, :] = jnp.where((iota == cy) & valid, 1.0, 0.0
                                    ).astype(jnp.bfloat16)
        u_scratch[:, :] = jnp.dot(
            p_scratch[:, :].T, q_scratch[:, :],
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        u = u_scratch[:, :]
        cols = []
        for dx in range(w):
            for dy in range(w):
                window = padded_ref[pl.ds(dx, size), pl.ds(dy, size)]  # bf16
                cols.append(jnp.sum((u * window).astype(jnp.float32)))
        row = jnp.stack(cols + [jnp.float32(0.0)] * (out_width - w * w))
        out_ref[pl.ds(a, 1), :] = row[None, :]
        return 0

    jax.lax.fori_loop(0, angles_per_block, one_angle, 0)


@functools.partial(jax.jit, static_argnames=("num_shifts", "angles_per_block"))
def pallas_correlative_scores(
    padded_grid: jnp.ndarray,  # (S + 2n, S + 2n) f32, pre-padded probability
    cells: jnp.ndarray,  # (A, N, 2) int32 per-angle discretized scan
    mask: jnp.ndarray,  # (N,) bool scan validity
    num_shifts: int,
    angles_per_block: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (raw_scores (A, w, w) summed probabilities, in-bounds valid
    point count per angle (A,)); the caller normalizes and adds the
    out-of-bounds unknown-probability correction."""
    a_total, n, _ = cells.shape
    w = 2 * num_shifts + 1
    size = padded_grid.shape[0] - 2 * num_shifts
    pad_a = (-a_total) % angles_per_block
    cx = jnp.pad(cells[:, :, 0], ((0, pad_a), (0, 0)))
    cy = jnp.pad(cells[:, :, 1], ((0, pad_a), (0, 0)))
    blocks = (a_total + pad_a) // angles_per_block
    out_width = max(128, ((w * w + 127) // 128) * 128)

    out = pl.pallas_call(
        functools.partial(_kernel, num_shifts=num_shifts, size=size,
                          angles_per_block=angles_per_block, num_points=n,
                          out_width=out_width),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((angles_per_block, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((angles_per_block, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((angles_per_block, out_width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a_total + pad_a, out_width), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n, size), jnp.bfloat16),
            pltpu.VMEM((n, size), jnp.bfloat16),
            pltpu.VMEM((size, size), jnp.bfloat16),
        ],
    )(cx, cy, mask.astype(jnp.int32)[:, None],
      padded_grid.astype(jnp.bfloat16))
    scores = out[:a_total, : w * w].reshape(a_total, w, w)
    # In-bounds valid-point count per angle (cheap; stays in XLA).
    inb = jnp.sum(
        ((cells[:, :, 0] >= 0) & (cells[:, :, 0] < size)
         & (cells[:, :, 1] >= 0) & (cells[:, :, 1] < size)
         & mask[None, :]).astype(jnp.float32), axis=-1)
    return scores, inb
