"""On-chip timing of 2D loop-closure matching (pyramid build + beam BnB).

Run:  python benchmarks/prof_bnb.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from timing import timeit_scanned

from cartographer_tpu.ops.bnb_2d import (
    FastCorrelativeMatcherParams2D, build_precomputation_pyramid,
    fast_correlative_match_2d)
from cartographer_tpu.ops.grid_2d import Grid2D
from cartographer_tpu.transform.rigid import Rigid2

S = 512
N = 256
params = FastCorrelativeMatcherParams2D(
    linear_search_window=4.0, angular_search_window=np.radians(30.0),
    branch_and_bound_depth=6, max_scan_range=12.0)

rng = np.random.RandomState(0)
angles = np.linspace(-np.pi, np.pi, N, endpoint=False)
radii = 8.0 + 1.5 * np.sin(3 * angles) + 0.02 * rng.randn(N)
pts = jnp.asarray(
    np.stack([radii * np.cos(angles), radii * np.sin(angles)], -1).astype(np.float32))
mask = jnp.ones(N, bool)
grid = Grid2D.create(S, 0.05, jnp.zeros(2))
prob = jnp.asarray(rng.rand(S, S).astype(np.float32))
grid = grid.__class__(log_odds=grid.log_odds, known=jnp.ones((S, S), bool),
                      origin=grid.origin, resolution=grid.resolution)

pyramid = build_precomputation_pyramid(prob, params.branch_and_bound_depth)


def build(p):
    return build_precomputation_pyramid(p, params.branch_and_bound_depth)


def match(pyr, points):
    found, score, pose = fast_correlative_match_2d(
        pyr, grid, points, mask, Rigid2.from_vector(jnp.zeros(3)), params,
        min_score=0.5)
    return score, pose.to_vector()


timeit_scanned("pyramid build (depth 6)", build,
               lambda c, a: (a[0] + c * 1e-9,), prob)
timeit_scanned("bnb match (beam 4096)", match,
               lambda c, a: (a[0] + c * 1e-9, a[1] + c * 1e-7), pyramid, pts)

import dataclasses
for beam in (1024, 256):
    params2 = dataclasses.replace(params, beam_width=beam)

    def match_b(pyr, points, params2=params2):
        found, score, pose = fast_correlative_match_2d(
            pyr, grid, points, mask, Rigid2.from_vector(jnp.zeros(3)), params2,
            min_score=0.5)
        return score, pose.to_vector()

    timeit_scanned(f"bnb match (beam {beam})", match_b,
                   lambda c, a: (a[0] + c * 1e-9, a[1] + c * 1e-7), pyramid, pts)
