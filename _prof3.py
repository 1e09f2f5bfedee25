import time, functools, numpy as np, jax, jax.numpy as jnp
from cartographer_tpu.ops.grid_2d import Grid2D
from cartographer_tpu.ops.correlative_2d import CorrelativeSearchParams, _candidate_geometry
from cartographer_tpu.ops.onehot import onehot_rows
from cartographer_tpu.sensor.point_cloud import PointCloud
from cartographer_tpu.sensor.voxel_filter import adaptive_voxel_filter
from cartographer_tpu.transform.rigid import Rigid2
from cartographer_tpu.ops.probability import UNKNOWN_PROBABILITY

Ncap, S, B = 256, 512, 8
params = CorrelativeSearchParams(max_scan_range=10.0)
rng = np.random.RandomState(0)
NRAW = 1024
ang = np.linspace(-np.pi, np.pi, NRAW, endpoint=False)
radii = 8.0 + 1.5*np.sin(3*ang) + 0.02*rng.randn(B, NRAW)
pts_raw = jnp.asarray(np.stack([radii*np.cos(ang), radii*np.sin(ang)], -1).astype(np.float32))
mask_raw = jnp.ones((B, NRAW), bool)
seeds = jnp.asarray(np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(B)]))
grids = jax.vmap(lambda c: Grid2D.create(S, 0.05, c))(jnp.zeros((B,2)))
poses = jnp.zeros((B,3))

@jax.jit
@jax.vmap
def prep(p, m, s):
    c = PointCloud(points=p, mask=m, intensities=jnp.zeros(NRAW, jnp.float32))
    f = adaptive_voxel_filter(c, 0.5, 200, 50.0, s).compact(Ncap)
    return f.points, f.mask
fp, fm = prep(pts_raw, mask_raw, seeds)

nl = params.num_linear(0.05)
W = 2*nl+1

def geom(grid, pts, mask, pose_vec):
    return _candidate_geometry(grid, pts, mask, Rigid2.from_vector(pose_vec), params)

def scores_bf16(grid, pts, mask, pose_vec, chunk):
    deltas, av, base_cells = geom(grid, pts, mask, pose_vec)
    prob = grid.probability()
    padded = jnp.pad(prob, nl)
    shifted = jnp.stack([padded[a:a+S, b:b+S] for a in range(W) for b in range(W)]).reshape(W*W, S*S).astype(jnp.bfloat16)
    A = base_cells.shape[0]
    padA = (-A) % chunk
    cells = jnp.pad(base_cells, ((0,padA),(0,0),(0,0)))
    nv = jnp.maximum(jnp.sum(mask),1).astype(jnp.float32)
    def score_chunk(cc):
        cx, cy = cc[...,0], cc[...,1]
        inb = (cx>=0)&(cx<S)&(cy>=0)&(cy<S)&mask[None]
        P = jax.vmap(lambda c,v: onehot_rows(c,v,S))(cx,inb)
        Q = jax.vmap(lambda c,v: onehot_rows(c,v,S))(cy,inb)
        U = jnp.einsum("cns,cnr->csr", P, Q, preferred_element_type=jnp.bfloat16)
        raw = jnp.dot(U.reshape(-1, S*S), shifted.T, preferred_element_type=jnp.float32)
        oob = nv - jnp.sum(inb,-1).astype(jnp.float32)
        return (raw + (UNKNOWN_PROBABILITY*oob)[:,None])/nv
    out = jax.lax.map(score_chunk, cells.reshape(-1, chunk, Ncap, 2))
    return out.reshape(-1, W*W)[:A].sum()  # reduce to force compute

def scores_int8(grid, pts, mask, pose_vec, chunk):
    deltas, av, base_cells = geom(grid, pts, mask, pose_vec)
    prob = grid.probability()
    padded = jnp.pad(prob, nl)
    shifted = jnp.stack([padded[a:a+S, b:b+S] for a in range(W) for b in range(W)]).reshape(W*W, S*S).astype(jnp.bfloat16)
    A = base_cells.shape[0]
    padA = (-A) % chunk
    cells = jnp.pad(base_cells, ((0,padA),(0,0),(0,0)))
    nv = jnp.maximum(jnp.sum(mask),1).astype(jnp.float32)
    def score_chunk(cc):
        cx, cy = cc[...,0], cc[...,1]
        inb = (cx>=0)&(cx<S)&(cy>=0)&(cy<S)&mask[None]
        P = jax.vmap(lambda c,v: onehot_rows(c,v,S,jnp.int8))(cx,inb)
        Q = jax.vmap(lambda c,v: onehot_rows(c,v,S,jnp.int8))(cy,inb)
        U = jnp.einsum("cns,cnr->csr", P, Q, preferred_element_type=jnp.int32).astype(jnp.bfloat16)
        raw = jnp.dot(U.reshape(-1, S*S), shifted.T, preferred_element_type=jnp.float32)
        oob = nv - jnp.sum(inb,-1).astype(jnp.float32)
        return (raw + (UNKNOWN_PROBABILITY*oob)[:,None])/nv
    out = jax.lax.map(score_chunk, cells.reshape(-1, chunk, Ncap, 2))
    return out.reshape(-1, W*W)[:A].sum()

def bench(name, fn, reps=30):
    f = jax.jit(jax.vmap(fn))
    out = f(grids, fp, fm, poses); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(reps): out = f(grids, fp, fm, poses)
    jax.block_until_ready(out)
    dt=(time.perf_counter()-t0)/reps
    print(f"{name:28s} {dt*1e3:8.3f} ms ({B/dt:8.1f} scans/s)")

for ch in (32, 72, 144):
    bench(f"bf16 chunk={ch}", functools.partial(lambda g,p,m,v,ch=ch: scores_bf16(g,p,m,v,ch)))
for ch in (32, 72, 144):
    bench(f"int8 chunk={ch}", functools.partial(lambda g,p,m,v,ch=ch: scores_int8(g,p,m,v,ch)))
