"""Surface-signs (KITTI-style) dataset, the fork's custom dataset
(reference detectron2/data/datasets/surface_signs.py:18-60,
``register_ssigns_instances``): COCO-format annotations of road surface signs."""

from __future__ import annotations

from ..catalog import DatasetCatalog, MetadataCatalog
from .coco import load_coco_json

__all__ = ["register_ssigns_instances"]

SSIGNS_CLASSES = [
    "arrow_straight", "arrow_left", "arrow_right", "arrow_straight_left",
    "arrow_straight_right", "crosswalk", "stop_line", "speed_limit", "other_sign",
]


def register_ssigns_instances(name, metadata, json_file, image_root):
    meta = {"thing_classes": SSIGNS_CLASSES}
    meta.update(metadata)
    DatasetCatalog.register(name, lambda: load_coco_json(json_file, image_root, name))
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="coco", **meta
    )
