"""Multi-chip scaling over jax.sharding.Mesh (SURVEY.md §2.10).

The reference distributes via gRPC only (P4/P5); the TPU build instead
shards the numeric core over ICI:

- P1 (task-DAG loop-closure fan-out)  -> shard (node, submap) candidate
  pairs across chips; each chip runs the batched BnB matcher on its shard
  (sharded_matching.py).
- P5/P6 (multi-tier global SLAM)      -> distributed SPA: constraints
  sharded across chips, normal equations psum'd over ICI, replicated solve
  (distributed_spa.py).
"""

from cartographer_tpu.parallel.mesh import make_mesh
from cartographer_tpu.parallel.sharded_matching import sharded_match_pairs
from cartographer_tpu.parallel.distributed_spa import solve_spa_2d_sharded
