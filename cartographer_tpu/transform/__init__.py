"""SE(2)/SE(3) transforms as batched JAX pytrees.

Equivalent of the reference `cartographer/transform/` (SURVEY.md §2.2), but
designed for TPU: transforms are arrays-of-structs pytrees so whole point
clouds and whole candidate sets transform in one vectorized op.
"""

from cartographer_tpu.transform.rigid import Rigid2, Rigid3, embed_3d, project_2d
from cartographer_tpu.transform import quaternion
from cartographer_tpu.transform.interpolation import (
    TransformInterpolationBuffer,
    interpolate_rigid3,
)
