from .coco import (
    build_noisy_label_dataset_coco,
    build_toy_dataset_coco,
    convert_to_coco_dict,
    convert_to_coco_json,
    load_coco_json,
    load_sem_seg,
    register_coco_instances,
)

__all__ = [k for k in globals().keys() if not k.startswith("_")]
