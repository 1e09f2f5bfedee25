"""Fused correlative scoring as a Pallas TPU kernel [KERNEL].

The XLA count-image formulation (ops/correlative_2d._scores_mxu) is
HBM-bandwidth bound: per angle it writes a (S, S) count image U and the
one-hot operands to HBM and reads them back for the shift correlation.

This kernel keeps everything on-chip: the padded probability grid lives in
VMEM for the whole call (~1 MB at S=512), per-angle one-hots are generated
in VMEM from the discretized cells by iota comparison, U = P^T Q runs on the
MXU into VMEM scratch, and the (2n+1)^2 shift scores are VPU dot products
against statically-sliced windows of the padded grid. The only HBM traffic
is cells in (~1 MB) and scores out (~100 KB).

Mosaic constraints honored: all intermediates are >= 2-D, bool vectors are
never reshaped (comparisons stay 2-D; the only transposes are on int32).
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
                 & (m > 0))  # (N, 1) bool, 2-D throughout
        iota = jax.lax.broadcasted_iota(jnp.int32, (num_points, size), 1)
        p_scratch[:, :] = jnp.where((iota == cx) & valid, 1.0, 0.0
                                    ).astype(jnp.bfloat16)
        q_scratch[:, :] = jnp.where((iota == cy) & valid, 1.0, 0.0
                                    ).astype(jnp.bfloat16)
        u_scratch[:, :] = jnp.dot(p_scratch[:, :].T, q_scratch[:, :],
                                  preferred_element_type=jnp.float32)
        u = u_scratch[:, :]
        entries = []
        for dx in range(w):
            for dy in range(w):
                window = padded_ref[pl.ds(dx, size), pl.ds(dy, size)]
                entries.append(jnp.sum(u * window))
        # Last used slot carries the in-bounds valid-point count.
        entries.append(jnp.sum(jnp.where(valid, 1.0, 0.0)))
        row = jnp.stack(entries + [jnp.float32(0.0)] * (out_width - len(entries)))
        out_ref[a, :] = row
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
    out_width = max(128, ((w * w + 1 + 127) // 128) * 128)

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
            pltpu.VMEM((size, size), jnp.float32),
        ],
    )(cx, cy, mask.astype(jnp.int32)[:, None], padded_grid)
    scores = out[:a_total, : w * w].reshape(a_total, w, w)
    inb = out[:a_total, w * w]
    return scores, inb
