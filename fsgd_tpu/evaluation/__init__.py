from .cocoeval import COCOeval
from .coco_evaluation import COCOEvaluator, instances_to_coco_json
from .evaluator import (
    Analyzer,
    DatasetEvaluator,
    DatasetEvaluators,
    inference_context,
    inference_on_dataset,
    load_old_inference_results,
)
from .cityscapes_evaluation import CityscapesEvaluator
from .lvis_evaluation import LVISEvaluator
from .panoptic_evaluation import COCOPanopticEvaluator
from .pascal_voc_evaluation import PascalVOCDetectionEvaluator
from .sem_seg_evaluation import SemSegEvaluator
from .testing import flatten_results_dict, print_csv_format, verify_results

__all__ = [k for k in globals().keys() if not k.startswith("_")]
