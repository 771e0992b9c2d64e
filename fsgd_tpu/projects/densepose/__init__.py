from .config import add_densepose_config
from .densepose_head import (
    DensePosePredictor,
    DensePoseV1ConvXHead,
    densepose_inference,
    densepose_losses,
)
from .roi_head import DensePoseROIHeads

__all__ = [
    "add_densepose_config",
    "DensePoseROIHeads",
    "DensePoseV1ConvXHead",
    "DensePosePredictor",
    "densepose_losses",
    "densepose_inference",
]
