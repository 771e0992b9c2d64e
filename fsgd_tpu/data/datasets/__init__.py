from .coco import (
    build_noisy_label_dataset_coco,
    build_toy_dataset_coco,
    convert_to_coco_dict,
    convert_to_coco_json,
    load_coco_json,
    load_sem_seg,
    register_coco_instances,
)
from .cityscapes import load_cityscapes_instances, load_cityscapes_semantic, register_cityscapes
from .lvis import build_toy_dataset_lvis, load_lvis_json, register_lvis_instances
from .pascal_voc import load_voc_instances, register_pascal_voc
from .surface_signs import register_ssigns_instances
from . import builtin  # noqa: F401  (registers the standard splits)

__all__ = [k for k in globals().keys() if not k.startswith("_")]
