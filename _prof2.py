import time, numpy as np, jax, jax.numpy as jnp
from cartographer_tpu.ops.correlative_2d import CorrelativeSearchParams, real_time_correlative_match
from cartographer_tpu.ops.grid_2d import Grid2D
from cartographer_tpu.ops.scan_matcher_2d import GaussNewtonMatcherParams2D, gauss_newton_match_2d
from cartographer_tpu.sensor.point_cloud import PointCloud
from cartographer_tpu.sensor.voxel_filter import adaptive_voxel_filter
from cartographer_tpu.transform.rigid import Rigid2

N, GRID, B = 1024, 512, 8
corr_params = CorrelativeSearchParams(max_scan_range=10.0)
gn_params = GaussNewtonMatcherParams2D()
rng = np.random.RandomState(0)
angles = np.linspace(-np.pi, np.pi, N, endpoint=False)
radii = 8.0 + 1.5*np.sin(3*angles) + 0.02*rng.randn(B, N)
pts = jnp.asarray(np.stack([radii*np.cos(angles), radii*np.sin(angles)], -1).astype(np.float32))
mask = jnp.ones((B, N), bool)
seeds = jnp.asarray(np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(B)]))
grids = jax.vmap(lambda c: Grid2D.create(GRID, 0.05, c))(jnp.zeros((B,2)))
poses = jnp.zeros((B,3))

def vfc(pts, mask, seed, cap):
    cloud = PointCloud(points=pts, mask=mask, intensities=jnp.zeros(N, jnp.float32))
    f = adaptive_voxel_filter(cloud, 0.5, 200, 50.0, seed)
    f = f.compact(cap)
    return f.points, f.mask

def corr(grid, pts, mask, pose_vec, method):
    _, c = real_time_correlative_match(grid, pts, mask, Rigid2.from_vector(pose_vec), corr_params, method=method)
    return c.to_vector()

def gn(grid, pts, mask, coarse_vec):
    c = Rigid2.from_vector(coarse_vec)
    p, _ = gauss_newton_match_2d(grid, pts, mask, c, gn_params, target_translation=c.translation)
    return p.to_vector()

def bench(name, fn, *args, reps=30):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/reps
    print(f"{name:24s} {dt*1e3:8.3f} ms/step ({B/dt:8.1f} scans/s)")
    return out, dt

for cap in (256, 384):
    fvf = jax.jit(jax.vmap(lambda p,m,s: vfc(p,m,s,cap)))
    (fp, fm), _ = bench(f"voxel+compact{cap}", fvf, pts, mask, seeds)
    print("  valid:", np.asarray(jnp.sum(fm, -1)))
    for method in ("mxu", "pallas"):
        try:
            fc = jax.jit(jax.vmap(lambda g,p,m,v: corr(g,p,m,v,method)))
            cv, _ = bench(f"corr[{method}] N={cap}", fc, grids, fp, fm, poses)
        except Exception as e:
            print(f"corr[{method}] failed: {type(e).__name__}: {str(e)[:200]}")
    fg = jax.jit(jax.vmap(gn))
    bench(f"gn N={cap}", fg, grids, fp, fm, cv)
