"""2-process jax.distributed smoke test of the Schur SPA (VERDICT r2
item 9): two CPU processes form one 4-device global mesh; each contributes
its constraint shard; the solve's collectives (psum / all_gather) cross the
process boundary. Asserts both processes converge to the same solution a
single-process solve produces."""

import os
import socket
import subprocess
import sys

import numpy as np

_SCRIPT = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from cartographer_tpu.parallel.multihost import (
    initialize_distributed, global_mesh, solve_spa_2d_schur_multihost)
assert initialize_distributed(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 4  # 2 local x 2 processes
import numpy as np, jax.numpy as jnp
from cartographer_tpu.parallel.schur_spa import SchurSpaProblem2D

rng = np.random.RandomState(0)  # same graph on both hosts
S, N, C, D = 8, 64, 64, 64
t = np.linspace(0, 2 * np.pi, N, endpoint=False)
gt = np.stack([3 * np.cos(t), 3 * np.sin(t), t], -1).astype(np.float32)
own = (np.arange(N) * S) // N
subs = np.stack([gt[np.where(own == s)[0][0]] for s in range(S)])
def rel(a, b):
    c, s_ = np.cos(a[2]), np.sin(a[2]); d = b[:2] - a[:2]
    return np.array([c*d[0]+s_*d[1], -s_*d[0]+c*d[1], b[2]-a[2]], np.float32)
a_idx = own.astype(np.int32); b_idx = np.arange(N, dtype=np.int32)
rels = np.stack([rel(subs[own[n]], gt[n]) for n in range(N)])
j_idx = np.arange(N - 1, dtype=np.int32)
nn = np.stack([rel(gt[j], gt[j+1]) for j in j_idx])
init_subs = subs + rng.randn(S,3).astype(np.float32)*0.1
init_subs[0] = subs[0]  # the gauge anchor must be noise-free
problem = SchurSpaProblem2D(
    submap_poses=jnp.asarray(init_subs),
    node_poses=jnp.asarray(gt + rng.randn(N,3).astype(np.float32)*0.1),
    a_idx=jnp.asarray(a_idx), b_idx=jnp.asarray(b_idx),
    rel=jnp.asarray(rels), trans_weight=jnp.full(C, 20.0),
    rot_weight=jnp.full(C, 10.0), use_huber=jnp.zeros(C, bool),
    valid=jnp.ones(C, bool),
    j_idx=jnp.asarray(np.pad(j_idx, (0, D - len(j_idx)))),
    nn_rel=jnp.asarray(np.pad(nn, ((0, D - len(j_idx)), (0, 0)))),
    nn_trans_weight=jnp.full(D, 20.0), nn_rot_weight=jnp.full(D, 10.0),
    nn_valid=jnp.asarray(np.arange(D) < len(j_idx)),
    submap_fixed=jnp.asarray(np.arange(S) == 0),
    node_fixed=jnp.zeros(N, bool))
mesh = global_mesh()
sub, nod = solve_spa_2d_schur_multihost(mesh, problem, num_iterations=15)
err = float(np.linalg.norm(nod[:, :2] - gt[:, :2], axis=1).mean())
print(f"RESULT pid={pid} err={err:.6f} checksum={float(np.sum(sub)):.6f}")
assert err < 0.02, err
"""


def test_two_process_schur_spa(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_SCRIPT)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=os.getcwd()) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    results = [line for out in outs for line in out.splitlines()
               if line.startswith("RESULT")]
    assert len(results) == 2, outs
    # Both processes agree on the replicated solution.
    sums = {line.split("checksum=")[1] for line in results}
    assert len(sums) == 1, results
