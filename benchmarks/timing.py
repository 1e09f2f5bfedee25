"""Honest on-chip timing over the axon tunnel.

jax.block_until_ready does NOT reliably wait for execution on the axon
backend (it returns after ~one RTT regardless of queue depth), so wall-time
around it measures dispatch, not compute. The only reliable sync is fetching
a value. This harness:

  - runs the stage K times inside ONE compiled program (lax.scan), with a
    caller-supplied perturbation of the inputs per iteration so XLA cannot
    hoist the body out of the loop,
  - reduces every output element into the scalar carry so nothing is DCE'd,
  - syncs by fetching the scalar (1 RTT),
  - reports the slope between two K values, cancelling the RTT and all
    per-dispatch fixed costs.
"""

import time

import jax
import jax.numpy as jnp


def timeit_scanned(name, fn, perturb, *args, ks=(3, 12), reps=3):
    """Time one iteration of `fn(*perturb(carry, args))`.

    perturb(carry, args) -> new args; must make every expensive input depend
    on the carry (use x + carry * tiny for floats, x + jnp.int32(carry * 1e-12)
    for ints).
    """

    def make(k):
        def run(args):
            def body(carry, _):
                out = fn(*perturb(carry, args))
                total = sum(jnp.sum(l.astype(jnp.float32))
                            for l in jax.tree_util.tree_leaves(out))
                return carry + 1.0 + 1e-20 * total, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return c

        return jax.jit(run)

    f_small, f_big = make(ks[0]), make(ks[1])
    float(f_small(args))
    float(f_big(args))

    def best(f):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(args))
            times.append(time.perf_counter() - t0)
        return min(times)

    t_small, t_big = best(f_small), best(f_big)
    per_iter = (t_big - t_small) / (ks[1] - ks[0])
    if name:
        print(f"{name:34s} {per_iter*1e3:8.3f} ms/iter")
    return per_iter
