import time, numpy as np, jax, jax.numpy as jnp
from cartographer_tpu.ops.correlative_2d import CorrelativeSearchParams, real_time_correlative_match
from cartographer_tpu.ops.grid_2d import Grid2D, insert_range_data
from cartographer_tpu.ops.scan_matcher_2d import GaussNewtonMatcherParams2D, gauss_newton_match_2d
from cartographer_tpu.sensor.point_cloud import PointCloud, RangeData
from cartographer_tpu.sensor.voxel_filter import adaptive_voxel_filter
from cartographer_tpu.transform.rigid import Rigid2

N, GRID, B, STEPS = 1024, 512, 8, 32
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

def vf(pts, mask, seed):
    cloud = PointCloud(points=pts, mask=mask, intensities=jnp.zeros(N, jnp.float32))
    f = adaptive_voxel_filter(cloud, 0.5, 200, 50.0, seed)
    return f.points, f.mask

def corr(grid, pts, mask, pose_vec):
    _, c = real_time_correlative_match(grid, pts, mask, Rigid2.from_vector(pose_vec), corr_params)
    return c.to_vector()

def gn(grid, pts, mask, coarse_vec):
    c = Rigid2.from_vector(coarse_vec)
    p, _ = gauss_newton_match_2d(grid, pts, mask, c, gn_params, target_translation=c.translation)
    return p.to_vector()

def ins(grid, pts, mask, pose_vec):
    pose = Rigid2.from_vector(pose_vec)
    cloud = PointCloud(points=pts, mask=mask, intensities=jnp.zeros(N, jnp.float32))
    rd = RangeData(origin=pose.translation, returns=cloud.transform(pose), misses=PointCloud.empty(N,2))
    return insert_range_data(grid, rd)

fvf = jax.jit(jax.vmap(vf))
fcorr = jax.jit(jax.vmap(corr))
fgn = jax.jit(jax.vmap(gn))
fins = jax.jit(jax.vmap(ins), donate_argnums=(0,))

fp, fm = fvf(pts, mask, seeds)
cv = fcorr(grids, fp, fm, poses)
pv = fgn(grids, fp, fm, cv)
g2 = fins(grids, fp, fm, pv)
jax.block_until_ready((fp, cv, pv, g2))
grids = jax.vmap(lambda c: Grid2D.create(GRID, 0.05, c))(jnp.zeros((B,2)))

def bench(name, fn, *args, reps=50):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/reps
    print(f"{name:12s} {dt*1e3:8.3f} ms/step  ({B/dt:8.1f} scans/s)")
    return dt

t1 = bench("voxel", fvf, pts, mask, seeds)
t2 = bench("correlative", fcorr, grids, fp, fm, poses)
t3 = bench("gauss-newton", fgn, grids, fp, fm, cv)
# insert donates; rebuild each reps -- time with fresh grids copy approx via non-donated variant
fins2 = jax.jit(jax.vmap(ins))
t4 = bench("insert", fins2, grids, fp, fm, pv)
print(f"sum {1e3*(t1+t2+t3+t4):.3f} ms -> {B/(t1+t2+t3+t4):.1f} scans/s")
