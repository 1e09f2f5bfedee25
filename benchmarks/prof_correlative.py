"""Micro-bench of correlative scoring variants on chip.

Run:  python benchmarks/prof_correlative.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from timing import timeit_scanned

from cartographer_tpu.ops.correlative_2d import (
    CorrelativeSearchParams, _candidate_geometry)
from cartographer_tpu.ops.grid_2d import Grid2D
from cartographer_tpu.ops.onehot import onehot_rows
from cartographer_tpu.transform.rigid import Rigid2

N = 512
S = 512
B = 8

params = CorrelativeSearchParams(max_scan_range=10.0)

rng = np.random.RandomState(0)
angles = np.linspace(-np.pi, np.pi, N, endpoint=False)
radii = 8.0 + 1.5 * np.sin(3 * angles) + 0.02 * rng.randn(B, N)
pts = np.stack([radii * np.cos(angles), radii * np.sin(angles)], -1).astype(np.float32)
pts = jnp.asarray(pts)
masks = jnp.ones((B, N), bool)
poses = jnp.zeros((B, 3))
grids = jax.vmap(lambda c: Grid2D.create(S, 0.05, c))(jnp.zeros((B, 2)))
probs = jax.jit(jax.vmap(lambda g: g.probability()))(grids)
NL = params.num_linear(0.05)

geom = jax.jit(jax.vmap(lambda g, p, m, v: _candidate_geometry(
    g, p, m, Rigid2.from_vector(v), params)))
deltas, angle_valid, base_cells = geom(grids, pts, masks, poses)
A = base_cells.shape[1]
print(f"angles={A}, nl={NL}, N={N}, S={S}, B={B}")

PERTURB = lambda c, a: (a[0] + c * 1e-9, a[1] + jnp.int32(c * 1e-12)) + tuple(a[2:])


def mxu_variant(dtype_oh, dtype_u, chunk):
    def one(prob, cells, mask):
        s = S
        num_valid = jnp.maximum(jnp.sum(mask), 1).astype(jnp.float32)
        padded = jnp.pad(prob, NL)
        shifted = jnp.stack(
            [padded[a:a + s, b:b + s]
             for a in range(2 * NL + 1) for b in range(2 * NL + 1)]
        ).reshape((2 * NL + 1) ** 2, s * s).astype(jnp.bfloat16)
        pad_angles = (-A) % chunk
        cells_p = jnp.pad(cells, ((0, pad_angles), (0, 0), (0, 0)))

        def score_chunk(cells_chunk):
            cx = cells_chunk[..., 0]
            cy = cells_chunk[..., 1]
            inb = (cx >= 0) & (cx < s) & (cy >= 0) & (cy < s) & mask[None, :]
            P = jax.vmap(lambda c, v: onehot_rows(c, v, s, dtype=dtype_oh))(cx, inb)
            Q = jax.vmap(lambda c, v: onehot_rows(c, v, s, dtype=dtype_oh))(cy, inb)
            U = jnp.einsum("cns,cnr->csr", P, Q, preferred_element_type=dtype_u)
            raw = jnp.dot(U.astype(jnp.bfloat16).reshape(chunk, s * s),
                          shifted.T, preferred_element_type=jnp.float32)
            oob = num_valid - jnp.sum(inb, axis=-1).astype(jnp.float32)
            return (raw + 0.5 * oob[:, None]) / num_valid

        chunks = cells_p.reshape(-1, chunk, *cells_p.shape[1:])
        return jax.lax.map(score_chunk, chunks)
    return jax.vmap(one)


def pallas_variant(prob, cells, mask):
    from cartographer_tpu.ops.pallas_correlative import pallas_correlative_scores

    def one(prob, cells, mask):
        padded = jnp.pad(prob, NL)
        return pallas_correlative_scores(padded, cells, mask, NL)
    return jax.vmap(one)(prob, cells, mask)


timeit_scanned("mxu bf16/bf16 chunk32", mxu_variant(jnp.bfloat16, jnp.bfloat16, 32),
               PERTURB, probs, base_cells, masks, ks=(2, 8))
timeit_scanned("mxu bf16/bf16 chunk64", mxu_variant(jnp.bfloat16, jnp.bfloat16, 64),
               PERTURB, probs, base_cells, masks, ks=(2, 8))
timeit_scanned("mxu bf16/f32 chunk32", mxu_variant(jnp.bfloat16, jnp.float32, 32),
               PERTURB, probs, base_cells, masks, ks=(2, 8))
timeit_scanned("pallas fused", pallas_variant,
               PERTURB, probs, base_cells, masks, ks=(2, 8))
