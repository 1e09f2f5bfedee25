"""cartographer_tpu — a TPU-native 2D/3D LiDAR SLAM engine.

A from-scratch reimplementation of the capabilities of Google Cartographer
(reference: juwangvsu/cartographer-1, pure C++14) designed TPU-first:

- the compute-dense pipeline (voxel filtering, scan matching, grid insertion,
  branch-and-bound loop closure, sparse pose adjustment) runs as batched,
  statically-shaped JAX/XLA programs with Pallas kernels for the hot paths;
- the host runtime (sensor collation, work queues, pose-graph orchestration,
  serving) is Python + native C++ (`runtime/`);
- multi-chip scaling uses `jax.sharding.Mesh` + `shard_map` with ICI
  collectives instead of the reference's gRPC-only distribution.

Layer map mirrors the reference (see SURVEY.md §1):
  core/       <- cartographer/common/
  transform/  <- cartographer/transform/
  sensor/     <- cartographer/sensor/
  ops/        device kernels backing the [KERNEL] rows of SURVEY.md §2
  mapping/    <- cartographer/mapping/
  io/         <- cartographer/io/
  cloud/      <- cartographer/cloud/
  metrics/    <- cartographer/metrics/
  ground_truth/ <- cartographer/ground_truth/
  parallel/   multi-chip sharding (reference has no equivalent; SURVEY.md §2.10)
"""

__version__ = "0.1.0"
