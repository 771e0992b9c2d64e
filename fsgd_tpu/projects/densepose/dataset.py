"""DensePose-COCO dataset registration.

Parity target: projects/DensePose/densepose/dataset.py:8-47 — registers the
four densepose_coco_2014 splits via ``load_coco_json`` with the ``dp_*``
extra annotation keys, and attaches the SMPL asset pointers as metadata.
Asset paths resolve under $FSGD_DENSEPOSE_DATA instead of the reference's
``detectron2://densepose/`` PathManager scheme (no network on TPU pods).
"""

from __future__ import annotations

import os

from fsgd_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from fsgd_tpu.data.datasets.coco import load_coco_json

DENSEPOSE_KEYS = ["dp_x", "dp_y", "dp_I", "dp_U", "dp_V", "dp_masks"]

SPLITS = {
    "densepose_coco_2014_train": ("coco/train2014", "coco/annotations/densepose_train2014.json"),
    "densepose_coco_2014_minival": ("coco/val2014", "coco/annotations/densepose_minival2014.json"),
    "densepose_coco_2014_minival_100": (
        "coco/val2014",
        "coco/annotations/densepose_minival2014_100.json",
    ),
    "densepose_coco_2014_valminusminival": (
        "coco/val2014",
        "coco/annotations/densepose_valminusminival2014.json",
    ),
}


def get_densepose_metadata():
    root = os.environ.get("FSGD_DENSEPOSE_DATA", "densepose_data")
    return {
        "thing_classes": ["person"],
        "densepose_transform_src": os.path.join(root, "UV_symmetry_transforms.mat"),
        "densepose_smpl_subdiv": os.path.join(root, "SMPL_subdiv.mat"),
        "densepose_smpl_subdiv_transform": os.path.join(root, "SMPL_SUBDIV_TRANSFORM.mat"),
    }


def register_densepose_datasets(root: str = "datasets"):
    for key, (image_root, json_file) in SPLITS.items():
        if key in DatasetCatalog:
            continue
        json_file_abs = os.path.join(root, json_file)
        image_root_abs = os.path.join(root, image_root)
        DatasetCatalog.register(
            key,
            lambda key=key, json_file=json_file_abs, image_root=image_root_abs: load_coco_json(
                json_file, image_root, key, extra_annotation_keys=DENSEPOSE_KEYS
            ),
        )
        MetadataCatalog.get(key).set(
            json_file=json_file_abs, image_root=image_root_abs, **get_densepose_metadata()
        )
