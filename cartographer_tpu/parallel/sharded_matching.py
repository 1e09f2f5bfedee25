"""Loop-closure constraint search sharded across chips [KERNEL x MESH].

TPU equivalent of the reference's thread-pool fan-out of ComputeConstraint
tasks (constraint_builder_2d.cc:102-186 / SURVEY.md P1): a batch of
(node, submap) candidate pairs is sharded over the mesh's `pairs` axis with
shard_map; every chip runs the batched branch-and-bound matcher on its local
pairs; results gather back. No collectives are needed inside the search —
the pairs are independent — so scaling is embarrassingly parallel and ICI
is only used by the final all_gather.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cartographer_tpu.ops.bnb_2d import (
    FastCorrelativeMatcherParams2D,
    fast_correlative_match_2d,
)
from cartographer_tpu.ops.grid_2d import Grid2D
from cartographer_tpu.transform.rigid import Rigid2


def sharded_match_pairs(
    mesh: Mesh,
    pyramids: jnp.ndarray,  # (B, depth, S, S) per-pair precomputation stacks
    origins: jnp.ndarray,  # (B, 2) grid origins
    resolution: float,
    points: jnp.ndarray,  # (B, N, 2) per-pair node scans
    masks: jnp.ndarray,  # (B, N)
    init_poses: jnp.ndarray,  # (B, 3) initial node-in-grid-frame poses
    params: FastCorrelativeMatcherParams2D,
    min_score: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (found (B,), scores (B,), poses (B, 3)). B must divide by the
    mesh size (pad with dummy pairs)."""
    size = pyramids.shape[-1]

    def match_one(pyramid, origin, pts, mask, init_vec):
        grid = Grid2D(
            log_odds=jnp.zeros((size, size), jnp.float32),
            known=jnp.zeros((size, size), bool),
            origin=origin, resolution=resolution)
        found, score, pose = fast_correlative_match_2d(
            pyramid, grid, pts, mask, Rigid2.from_vector(init_vec),
            params, min_score)
        return found, score, pose.to_vector()

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("pairs"), P("pairs"), P("pairs"), P("pairs"), P("pairs")),
        out_specs=(P("pairs"), P("pairs"), P("pairs")),
    )
    def shard_fn(pyr, org, pts, msk, init):
        return jax.vmap(match_one)(pyr, org, pts, msk, init)

    return shard_fn(pyramids, origins, points, masks, init_poses)
