import time, numpy as np, jax, jax.numpy as jnp
from cartographer_tpu.ops.onehot import onehot_rows
N, S, B, A = 256, 512, 8, 144
CH = 72
W2 = 25
rng = np.random.RandomState(0)
cells = jnp.asarray(rng.randint(0, S, size=(B, A, N, 2)).astype(np.int32))
mask = jnp.ones((B, A, N), bool)
shifted = jnp.asarray(rng.rand(B, W2, S*S).astype(np.float32)).astype(jnp.bfloat16)
R = jnp.asarray(rng.rand(S, S).astype(np.float32)).astype(jnp.bfloat16)

def bench(name, f, *args, reps=20):
    out = f(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(reps): out=f(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms")

@jax.jit
def einsum_probe(cells, mask):
    def per_b(cells, mask):
        def chunk(cc):
            cx, cy, m = cc
            P = jax.vmap(lambda c,v: onehot_rows(c,v,S))(cx, m)
            Q = jax.vmap(lambda c,v: onehot_rows(c,v,S))(cy, m)
            U = jnp.einsum("cns,cnr->csr", P, Q, preferred_element_type=jnp.bfloat16)
            return jnp.sum(U * R[None], (1,2))   # non-simplifiable
        return jax.lax.map(chunk, (cells[...,0].reshape(-1,CH,N), cells[...,1].reshape(-1,CH,N), mask.reshape(-1,CH,N))).sum()
    return jax.vmap(per_b)(cells, mask)

@jax.jit
def full(cells, mask, shifted):
    def per_b(cells, mask, shifted):
        def chunk(cc):
            cx, cy, m = cc
            P = jax.vmap(lambda c,v: onehot_rows(c,v,S))(cx, m)
            Q = jax.vmap(lambda c,v: onehot_rows(c,v,S))(cy, m)
            U = jnp.einsum("cns,cnr->csr", P, Q, preferred_element_type=jnp.bfloat16)
            return jnp.dot(U.reshape(-1, S*S), shifted.T, preferred_element_type=jnp.float32)
        return jax.lax.map(chunk, (cells[...,0].reshape(-1,CH,N), cells[...,1].reshape(-1,CH,N), mask.reshape(-1,CH,N)))
    return jax.vmap(per_b)(cells, mask, shifted)

bench("einsum (x R probe)", einsum_probe, cells, mask)
bench("full->raw", full, cells, mask, shifted)

# Variant: einsum with N as the matmul M dim instead of batched:
# U = sum over chunk-angles of per-angle (S,N)x(N,S): try merging angle into N:
@jax.jit
def merged(cells, mask, shifted):
    # score[a, w] = sum_p shiftedgrid[w][cx,cy] ; build ONE onehot over (A*N) rows
    def per_b(cells, mask, shifted):
        cx = cells[...,0].reshape(-1)   # (A*N)
        cy = cells[...,1].reshape(-1)
        m = mask.reshape(-1)
        Pb = jax.vmap(lambda c,v: onehot_rows(c,v,S))(cx.reshape(A, N), mask)  # (A,N,S)
        # gather per-point shifted values: V[p, w] = sum_s onehotx[p,s] * Hw[s, cy_p]?? needs 2nd index; skip
        return Pb.sum()
    return jax.vmap(per_b)(cells, mask, shifted)

