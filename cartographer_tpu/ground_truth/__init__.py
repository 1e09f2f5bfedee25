"""Ground-truth generation & relation-based trajectory evaluation.

Reference: cartographer/ground_truth/ (SURVEY.md §2.9) — autogenerate
relations from an optimized map's loop-closure constraints, then score a
test trajectory's relative poses against them (Burgard et al. relation
metric, docs/source/evaluation.rst).
"""

from cartographer_tpu.ground_truth.relations import (
    GroundTruthRelation,
    autogenerate_ground_truth,
    autogenerate_ground_truth_3d,
    compute_relations_metrics,
)
