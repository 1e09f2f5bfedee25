import time, numpy as np, jax, jax.numpy as jnp
from cartographer_tpu.ops.onehot import onehot_rows
N, S, B, A = 256, 512, 8, 144
CH = 72
W2 = 25
rng = np.random.RandomState(0)
cells = jnp.asarray(rng.randint(0, S, size=(B, A, N, 2)).astype(np.int32))
mask = jnp.ones((B, A, N), bool)
shifted = jnp.asarray(rng.rand(B, W2, S*S).astype(np.float32)).astype(jnp.bfloat16)
U0 = jnp.asarray(rng.rand(B, A, S, S).astype(np.float32)).astype(jnp.bfloat16)

def bench(name, f, *args, reps=20):
    out = f(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(reps): out=f(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms")

@jax.jit
def onehots_only(cells, mask):
    def per_b(cells, mask):
        def chunk(cc):
            cx, cy, m = cc
            P = jax.vmap(lambda c,v: onehot_rows(c,v,S))(cx, m)
            Q = jax.vmap(lambda c,v: onehot_rows(c,v,S))(cy, m)
            return jnp.sum(P, (0,1)) + jnp.sum(Q, (0,1))
        return jax.lax.map(chunk, (cells[...,0].reshape(-1,CH,N), cells[...,1].reshape(-1,CH,N), mask.reshape(-1,CH,N))).sum()
    return jax.vmap(per_b)(cells, mask)

@jax.jit
def einsum_only(cells, mask):
    def per_b(cells, mask):
        def chunk(cc):
            cx, cy, m = cc
            P = jax.vmap(lambda c,v: onehot_rows(c,v,S))(cx, m)
            Q = jax.vmap(lambda c,v: onehot_rows(c,v,S))(cy, m)
            U = jnp.einsum("cns,cnr->csr", P, Q, preferred_element_type=jnp.bfloat16)
            return jnp.sum(U.astype(jnp.float32), (1,2))
        return jax.lax.map(chunk, (cells[...,0].reshape(-1,CH,N), cells[...,1].reshape(-1,CH,N), mask.reshape(-1,CH,N))).sum()
    return jax.vmap(per_b)(cells, mask)

@jax.jit
def second_only(U, shifted):
    def per_b(U, shifted):
        def chunk(u):
            return jnp.dot(u.reshape(-1, S*S), shifted.T, preferred_element_type=jnp.float32)
        return jax.lax.map(chunk, U.reshape(-1, CH, S, S)).sum()
    return jax.vmap(per_b)(U, shifted)

@jax.jit
def full(cells, mask, shifted):
    def per_b(cells, mask, shifted):
        def chunk(cc):
            cx, cy, m = cc
            P = jax.vmap(lambda c,v: onehot_rows(c,v,S))(cx, m)
            Q = jax.vmap(lambda c,v: onehot_rows(c,v,S))(cy, m)
            U = jnp.einsum("cns,cnr->csr", P, Q, preferred_element_type=jnp.bfloat16)
            return jnp.dot(U.reshape(-1, S*S), shifted.T, preferred_element_type=jnp.float32)
        return jax.lax.map(chunk, (cells[...,0].reshape(-1,CH,N), cells[...,1].reshape(-1,CH,N), mask.reshape(-1,CH,N))).sum()
    return jax.vmap(per_b)(cells, mask, shifted)

bench("onehots only", onehots_only, cells, mask)
bench("onehot+einsum", einsum_only, cells, mask)
bench("second matmul only", second_only, U0, shifted)
bench("full", full, cells, mask, shifted)
