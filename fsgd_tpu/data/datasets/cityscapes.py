"""Cityscapes dataset loading (parity with detectron2/data/datasets/cityscapes.py:25-180).

Parses the fine-annotation polygon jsons into instance dicts; semantic
labels use the standard 19 train ids.
"""

from __future__ import annotations

import glob
import json
import logging
import os

from ...structures import BoxMode
from ..catalog import DatasetCatalog, MetadataCatalog

logger = logging.getLogger(__name__)

__all__ = ["load_cityscapes_instances", "load_cityscapes_semantic", "register_cityscapes"]

# the 8 "thing" classes used for instance segmentation, with train ids
CITYSCAPES_THING_CLASSES = [
    "person", "rider", "car", "truck", "bus", "train", "motorcycle", "bicycle",
]


def _get_files(image_dir, gt_dir):
    files = []
    for image_file in sorted(glob.glob(os.path.join(image_dir, "**", "*leftImg8bit.png"), recursive=True)):
        suffix = "leftImg8bit.png"
        prefix = os.path.basename(image_file)[: -len(suffix)]
        city = os.path.basename(os.path.dirname(image_file))
        instance_file = os.path.join(gt_dir, city, prefix + "gtFine_polygons.json")
        label_file = os.path.join(gt_dir, city, prefix + "gtFine_labelIds.png")
        files.append((image_file, instance_file, label_file))
    assert len(files), "No images found in {}".format(image_dir)
    return files


def load_cityscapes_instances(image_dir, gt_dir, from_json=True, to_polygons=True):
    files = _get_files(image_dir, gt_dir)
    ret = []
    name_to_id = {n: i for i, n in enumerate(CITYSCAPES_THING_CLASSES)}
    for image_file, instance_file, _ in files:
        with open(instance_file) as f:
            poly_json = json.load(f)
        record = {
            "file_name": image_file,
            "image_id": os.path.basename(image_file),
            "height": poly_json["imgHeight"],
            "width": poly_json["imgWidth"],
        }
        annos = []
        for obj in poly_json["objects"]:
            label = obj["label"]
            if label.endswith("group"):
                label = label[: -len("group")]
            if label not in name_to_id:
                continue
            polygon = [float(c) for xy in obj["polygon"] for c in xy]
            if len(polygon) < 6:
                continue
            xs = polygon[0::2]
            ys = polygon[1::2]
            annos.append(
                {
                    "category_id": name_to_id[label],
                    "bbox": [min(xs), min(ys), max(xs), max(ys)],
                    "bbox_mode": BoxMode.XYXY_ABS,
                    "segmentation": [polygon],
                    "iscrowd": 0,
                }
            )
        record["annotations"] = annos
        ret.append(record)
    logger.info("Loaded %d cityscapes images", len(ret))
    return ret


def load_cityscapes_semantic(image_dir, gt_dir):
    files = _get_files(image_dir, gt_dir)
    return [
        {"file_name": image_file, "sem_seg_file_name": label_file}
        for image_file, _, label_file in files
    ]


def register_cityscapes(name, image_dir, gt_dir, instances=True):
    if instances:
        DatasetCatalog.register(name, lambda: load_cityscapes_instances(image_dir, gt_dir))
        MetadataCatalog.get(name).set(
            thing_classes=list(CITYSCAPES_THING_CLASSES),
            image_dir=image_dir,
            gt_dir=gt_dir,
            evaluator_type="cityscapes",
        )
    else:
        DatasetCatalog.register(name, lambda: load_cityscapes_semantic(image_dir, gt_dir))
        MetadataCatalog.get(name).set(
            image_dir=image_dir, gt_dir=gt_dir, evaluator_type="sem_seg"
        )
