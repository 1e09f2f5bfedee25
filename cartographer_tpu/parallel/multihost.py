"""Multi-host (cross-process) execution scaffold.

The reference's cross-machine story is gRPC between whole SLAM servers
(SURVEY.md P4/P5); the TPU-native equivalent is a jax.distributed process
group whose devices form ONE global mesh, with the numeric core (sharded
constraint matching, Schur SPA) running XLA collectives across hosts over
ICI/DCN. This module provides the guarded initialization path plus the
host-local -> global array plumbing so the single-host mesh code spans
hosts unchanged (VERDICT r2 item 9; CPU-testable with 2 local processes,
tests/test_multihost_spa.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """jax.distributed.initialize, guarded: returns True when a process
    group is up (or already was), False when running single-process."""
    import jax

    if num_processes is None or num_processes <= 1:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        return True
    except RuntimeError as e:  # already initialized
        if "already" in str(e).lower():
            return True
        raise


def global_mesh(axis_name: str = "pairs"):
    """One mesh over ALL processes' devices (process-major order)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))


def solve_spa_2d_schur_multihost(mesh, problem, axis: str = "pairs", **kw):
    """solve_spa_2d_schur across a multi-host mesh.

    `problem` holds FULL host copies of every array on every process (the
    natural state: each host assembled the same graph). Constraint-axis
    arrays are scattered so each host contributes its slice; pose/fixed
    arrays replicate. Weights are pre-normalized host-side (the global
    arrays are not host-inspectable). Returns host numpy results.
    """
    import jax
    from jax.experimental import multihost_utils as mu
    from jax.sharding import PartitionSpec as P

    from cartographer_tpu.parallel.schur_spa import solve_spa_2d_schur

    wmax = float(max(
        np.max(np.where(np.asarray(problem.valid),
                        np.asarray(problem.trans_weight), 0.0), initial=0.0),
        np.max(np.where(np.asarray(problem.nn_valid),
                        np.asarray(problem.nn_trans_weight), 0.0), initial=0.0),
        np.max(np.where(np.asarray(problem.valid),
                        np.asarray(problem.rot_weight), 0.0), initial=0.0),
        np.max(np.where(np.asarray(problem.nn_valid),
                        np.asarray(problem.nn_rot_weight), 0.0), initial=0.0),
        1e-12))
    problem = dataclasses.replace(
        problem,
        trans_weight=problem.trans_weight / wmax,
        rot_weight=problem.rot_weight / wmax,
        nn_trans_weight=problem.nn_trans_weight / wmax,
        nn_rot_weight=problem.nn_rot_weight / wmax,
        u_trans_weight=problem.u_trans_weight / wmax,
        u_rot_weight=problem.u_rot_weight / wmax,
    )

    nproc = jax.process_count()
    pid = jax.process_index()
    rep_fields = {"submap_poses", "node_poses", "submap_fixed", "node_fixed"}

    def to_global(name, x):
        x = np.asarray(x)
        if name in rep_fields:
            return mu.host_local_array_to_global_array(x, mesh, P())
        chunk = x.shape[0] // nproc
        local = x[pid * chunk: (pid + 1) * chunk]
        return mu.host_local_array_to_global_array(local, mesh, P(axis))

    gproblem = type(problem)(**{
        f.name: to_global(f.name, getattr(problem, f.name))
        for f in dataclasses.fields(problem)})
    sub, nod = solve_spa_2d_schur(mesh, gproblem, axis=axis,
                                  huber_scale=kw.pop("huber_scale", 1e1) / wmax,
                                  **kw)
    return (np.asarray(sub.addressable_data(0)),
            np.asarray(nod.addressable_data(0)))
