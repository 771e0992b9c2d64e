from .config import add_densepose_config
from .dataset import register_densepose_datasets
from .dataset_mapper import (
    DensePoseDatasetMapper,
    DensePoseTrainLoader,
    build_densepose_train_loader,
    dp_annotations_to_batch_arrays,
)
from .densepose_cocoeval import DensePoseCocoEval
from .densepose_head import (
    DensePosePredictor,
    DensePoseV1ConvXHead,
    densepose_inference,
    densepose_losses,
)
from .evaluator import DensePoseCOCOEvaluator
from .roi_head import DensePoseROIHeads
from .structures import (
    DensePoseDataRelative,
    DensePoseList,
    DensePoseResult,
    DensePoseTransformData,
)

__all__ = [
    "add_densepose_config",
    "register_densepose_datasets",
    "DensePoseDatasetMapper",
    "DensePoseTrainLoader",
    "build_densepose_train_loader",
    "dp_annotations_to_batch_arrays",
    "DensePoseCocoEval",
    "DensePoseCOCOEvaluator",
    "DensePoseROIHeads",
    "DensePoseV1ConvXHead",
    "DensePosePredictor",
    "densepose_losses",
    "densepose_inference",
    "DensePoseDataRelative",
    "DensePoseList",
    "DensePoseResult",
    "DensePoseTransformData",
]
