import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from cartographer_tpu.ops.bnb_2d import (
    FastCorrelativeMatcherParams2D, build_precomputation_pyramid,
    _certified_match_fn)
from cartographer_tpu.ops.grid_2d import Grid2D

size, res = 512, 0.05
rng = np.random.RandomState(0)
probs = (rng.rand(size, size) < 0.05).astype(np.float32) * 0.9 + 0.05
import dataclasses
grid = Grid2D.create(size=size, resolution=res,
                     center=np.full(2, size*res/2, np.float32))
grid = dataclasses.replace(
    grid,
    log_odds=jnp.asarray(np.log(probs / (1 - probs)).astype(np.float32)),
    known=jnp.ones((size, size), bool))
pyr = build_precomputation_pyramid(grid.probability(), 7)
pyr = jax.block_until_ready(pyr)

params = FastCorrelativeMatcherParams2D(
    linear_search_window=7.0, angular_search_window=np.pi,
    branch_and_bound_depth=7, beam_width=4096, max_scan_range=12.0)
window = 0.5 * size * res * 0.7
pts = rng.randn(1024, 2).astype(np.float32) * 5
mask = np.ones(1024, bool)
init = jnp.asarray([size*res/2, size*res/2, 0.0], jnp.float32)
fn = _certified_match_fn(params, 0.55, window)
o = fn(pyr, grid, jnp.asarray(pts), jnp.asarray(mask), init)
jax.block_until_ready(o)
t0 = time.perf_counter()
N = 8
for _ in range(N):
    o = fn(pyr, grid, jnp.asarray(pts), jnp.asarray(mask), init)
    jax.block_until_ready(o)
print("full-submap certified match:", round((time.perf_counter()-t0)/N*1e3, 1), "ms")
