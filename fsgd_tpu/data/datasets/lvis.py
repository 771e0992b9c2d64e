"""LVIS dataset loading (parity with detectron2/data/datasets/lvis.py:22-216).

``load_lvis_json`` parses the LVIS v0.5 annotation format (same container
structure as COCO plus ``neg_category_ids`` / ``not_exhaustive_category_ids``
per image); category metadata is derived from the annotation file itself
(contiguous ids follow sorted dataset ids, which for LVIS are 1..1230).
Includes the fork's ``build_toy_dataset_lvis`` subsampler.
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np

from ...structures import BoxMode
from ..catalog import DatasetCatalog, MetadataCatalog

logger = logging.getLogger(__name__)

__all__ = ["load_lvis_json", "register_lvis_instances", "get_lvis_instances_meta", "build_toy_dataset_lvis"]


def register_lvis_instances(name, metadata, json_file, image_root):
    DatasetCatalog.register(name, lambda: load_lvis_json(json_file, image_root, name))
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="lvis", **metadata
    )


def load_lvis_json(json_file, image_root, dataset_name=None):
    with open(json_file) as f:
        data = json.load(f)
    imgs = {img["id"]: img for img in data["images"]}
    anns_per_img = {}
    for ann in data["annotations"]:
        anns_per_img.setdefault(ann["image_id"], []).append(ann)

    if dataset_name is not None and "categories" in data:
        meta = get_lvis_instances_meta_from_json(data)
        MetadataCatalog.get(dataset_name).set(**meta)

    dataset_dicts = []
    for img_id in sorted(imgs.keys()):
        img = imgs[img_id]
        # LVIS file names are derived from the COCO url
        file_name = img.get("file_name")
        if file_name is None:
            file_name = img["coco_url"].split("/")[-1]
        record = {
            "file_name": os.path.join(image_root, file_name),
            "height": img["height"],
            "width": img["width"],
            "image_id": img_id,
            "not_exhaustive_category_ids": img.get("not_exhaustive_category_ids", []),
            "neg_category_ids": img.get("neg_category_ids", []),
        }
        objs = []
        for ann in anns_per_img.get(img_id, []):
            obj = {
                "bbox": ann["bbox"],
                "bbox_mode": BoxMode.XYWH_ABS,
                # LVIS ids are 1-indexed and contiguous
                "category_id": ann["category_id"] - 1,
            }
            if "segmentation" in ann:
                segm = [poly for poly in ann["segmentation"] if len(poly) % 2 == 0 and len(poly) >= 6]
                obj["segmentation"] = segm
            objs.append(obj)
        record["annotations"] = objs
        dataset_dicts.append(record)
    logger.info("Loaded %d images from %s", len(dataset_dicts), json_file)
    return dataset_dicts


def get_lvis_instances_meta_from_json(data):
    cats = sorted(data["categories"], key=lambda x: x["id"])
    thing_classes = [c.get("synonyms", [c.get("name", str(c["id"]))])[0] for c in cats]
    return {"thing_classes": thing_classes}


def get_lvis_instances_meta(dataset_name):
    if "v0.5" in dataset_name:
        return {}  # classes come from the json at load time
    raise ValueError("No builtin metadata for dataset {}".format(dataset_name))


def build_toy_dataset_lvis(dataset_dicts, fraction: float = 0.2, seed: int = 42):
    """Fork lvis.py:216+: deterministic subsample for overfit experiments."""
    rng = np.random.RandomState(seed)
    n = max(int(len(dataset_dicts) * fraction), 1)
    idx = rng.choice(len(dataset_dicts), size=n, replace=False)
    return [dataset_dicts[i] for i in sorted(idx)]
