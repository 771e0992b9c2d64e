from .shape_spec import ShapeSpec
from .norms import FrozenBatchNorm, get_norm
from .wrappers import interpolate_nearest_2x, cat

__all__ = ["ShapeSpec", "FrozenBatchNorm", "get_norm", "interpolate_nearest_2x", "cat"]
