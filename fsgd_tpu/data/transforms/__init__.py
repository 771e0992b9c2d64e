from .transform import (
    BlendTransform,
    CropTransform,
    ExtentTransform,
    HFlipTransform,
    NoOpTransform,
    ResizeTransform,
    Transform,
    TransformList,
)
from .transform_gen import (
    RandomBrightness,
    RandomContrast,
    RandomCrop,
    RandomExtent,
    RandomFlip,
    RandomLighting,
    RandomSaturation,
    Resize,
    ResizeShortestEdge,
    TransformGen,
    apply_transform_gens,
)

__all__ = [k for k in globals().keys() if not k.startswith("_")]
