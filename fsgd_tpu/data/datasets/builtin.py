"""Builtin dataset registration (parity with detectron2/data/datasets/builtin.py:121-249).

Registers the standard COCO / LVIS / Cityscapes / Pascal VOC splits under
``$FSGD_DATASETS`` (default ``./datasets``) at import time.  Registration is
lazy — annotation files are only read when a dataset is actually used.
"""

from __future__ import annotations

import os

from ..catalog import MetadataCatalog
from .builtin_meta import _get_builtin_metadata
from .cityscapes import register_cityscapes
from .coco import register_coco_instances, register_coco_panoptic_separated
from .lvis import get_lvis_instances_meta, register_lvis_instances
from .pascal_voc import register_pascal_voc

_PREDEFINED_SPLITS_COCO = {
    "coco_2017_train": ("coco/train2017", "coco/annotations/instances_train2017.json"),
    "coco_2017_val": ("coco/val2017", "coco/annotations/instances_val2017.json"),
    "coco_2017_test": ("coco/test2017", "coco/annotations/image_info_test2017.json"),
    "coco_2017_test-dev": ("coco/test2017", "coco/annotations/image_info_test-dev2017.json"),
    "coco_2017_val_100": ("coco/val2017", "coco/annotations/instances_val2017_100.json"),
    # the fork's imbalance-experiment splits (reference builtin.py:49-63):
    # toy subsamples, uniform/frequency label noise and the long-tail remap,
    # produced by build_toy_dataset_coco / build_noisy_label_dataset_coco
    "coco_2017_train_100samples": ("coco/train2017", "coco/annotations/instances_train2017_100samples.json"),
    "coco_2017_val_100samples": ("coco/val2017", "coco/annotations/instances_val2017_100samples.json"),
    "coco_2017_train_8samples": ("coco/train2017", "coco/annotations/instances_train2017_8samples.json"),
    "coco_2017_train_8_difficult_samples": ("coco/train2017", "coco/annotations/instances_train2017_8_difficult_samples.json"),
    "coco_2017_train_1percent": ("coco/train2017", "coco/annotations/instances_train2017_1percent.json"),
    "coco_2017_train_5percent": ("coco/train2017", "coco/annotations/instances_train2017_5percent.json"),
    "coco_2017_train_10percent": ("coco/train2017", "coco/annotations/instances_train2017_10percent.json"),
    "coco_2017_train_20percent": ("coco/train2017", "coco/annotations/instances_train2017_20percent.json"),
    "coco_2017_train_10noise_uniform": ("coco/train2017", "coco/annotations/instances_train2017_10noise_uniform.json"),
    "coco_2017_train_20noise_uniform": ("coco/train2017", "coco/annotations/instances_train2017_20noise_uniform.json"),
    "coco_2017_train_50noise_uniform": ("coco/train2017", "coco/annotations/instances_train2017_50noise_uniform.json"),
    "coco_2017_train_10noise_frequency": ("coco/train2017", "coco/annotations/instances_train2017_10noise_frequency.json"),
    "coco_2017_train_20noise_frequency": ("coco/train2017", "coco/annotations/instances_train2017_20noise_frequency.json"),
    "coco_2017_train_50noise_frequency": ("coco/train2017", "coco/annotations/instances_train2017_50noise_frequency.json"),
    "coco_2017_train_LT": ("coco/train2017", "coco/annotations/instances_train2017_LT.json"),
    "coco_2014_train": ("coco/train2014", "coco/annotations/instances_train2014.json"),
    "coco_2014_val": ("coco/val2014", "coco/annotations/instances_val2014.json"),
    "coco_2014_minival": ("coco/val2014", "coco/annotations/instances_minival2014.json"),
    "coco_2014_valminusminival": ("coco/val2014", "coco/annotations/instances_valminusminival2014.json"),
}

_PREDEFINED_SPLITS_COCO_PERSON = {
    "keypoints_coco_2017_train": ("coco/train2017", "coco/annotations/person_keypoints_train2017.json"),
    "keypoints_coco_2017_val": ("coco/val2017", "coco/annotations/person_keypoints_val2017.json"),
    "keypoints_coco_2017_val_100": ("coco/val2017", "coco/annotations/person_keypoints_val2017_100.json"),
}

_PREDEFINED_SPLITS_LVIS = {
    "lvis_v0.5_train": ("coco/train2017", "lvis/lvis_v0.5_train.json"),
    "lvis_v0.5_val": ("coco/val2017", "lvis/lvis_v0.5_val.json"),
    "lvis_v0.5_val_rand_100": ("coco/val2017", "lvis/lvis_v0.5_val_rand_100.json"),
    "lvis_v0.5_test": ("coco/test2017", "lvis/lvis_v0.5_image_info_test.json"),
    # fork subset split (reference builtin.py:159, used by
    # LVIS-ImbalanceDetection/faster_rcnn_R_50_FPN_1x.yaml)
    "lvis_v0.5_train_one_forth": ("coco/train2017", "lvis/lvis_v0.5_train_one_forth.json"),
}


# panoptic splits: (panoptic annotation dir, panoptic json, semantic PNG dir
# converted from panoptic annotations — reference builtin.py:95-117)
_PREDEFINED_SPLITS_COCO_PANOPTIC = {
    "coco_2017_train_panoptic": (
        "coco/panoptic_train2017",
        "coco/annotations/panoptic_train2017.json",
        "coco/panoptic_stuff_train2017",
    ),
    "coco_2017_val_panoptic": (
        "coco/panoptic_val2017",
        "coco/annotations/panoptic_val2017.json",
        "coco/panoptic_stuff_val2017",
    ),
    "coco_2017_val_100_panoptic": (
        "coco/panoptic_val2017_100",
        "coco/annotations/panoptic_val2017_100.json",
        "coco/panoptic_stuff_val2017_100",
    ),
}


def register_all_coco(root):
    for key, (image_root, json_file) in _PREDEFINED_SPLITS_COCO.items():
        register_coco_instances(
            key,
            _get_builtin_metadata("coco"),
            os.path.join(root, json_file),
            os.path.join(root, image_root),
        )
    for key, (image_root, json_file) in _PREDEFINED_SPLITS_COCO_PERSON.items():
        register_coco_instances(
            key,
            _get_builtin_metadata("coco_person"),
            os.path.join(root, json_file),
            os.path.join(root, image_root),
        )
    for prefix, (panoptic_root, panoptic_json, semantic_root) in _PREDEFINED_SPLITS_COCO_PANOPTIC.items():
        prefix_instances = prefix[: -len("_panoptic")]
        instances_meta = MetadataCatalog.get(prefix_instances)
        register_coco_panoptic_separated(
            prefix,
            _get_builtin_metadata("coco_panoptic_separated"),
            instances_meta.image_root,
            os.path.join(root, panoptic_root),
            os.path.join(root, panoptic_json),
            os.path.join(root, semantic_root),
            instances_meta.json_file,
        )


def register_all_lvis(root):
    for key, (image_root, json_file) in _PREDEFINED_SPLITS_LVIS.items():
        register_lvis_instances(
            key,
            get_lvis_instances_meta(key),
            os.path.join(root, json_file),
            os.path.join(root, image_root),
        )


def register_all_cityscapes(root):
    for split in ["train", "val", "test"]:
        image_dir = os.path.join(root, "cityscapes/leftImg8bit/{}".format(split))
        gt_dir = os.path.join(root, "cityscapes/gtFine/{}".format(split))
        register_cityscapes(
            "cityscapes_fine_instance_seg_{}".format(split), image_dir, gt_dir, instances=True
        )
        register_cityscapes(
            "cityscapes_fine_sem_seg_{}".format(split), image_dir, gt_dir, instances=False
        )


def register_all_pascal_voc(root):
    for year in ("2007", "2012"):
        for split in (["trainval", "train", "val", "test"] if year == "2007" else ["trainval", "train", "val"]):
            name = "voc_{}_{}".format(year, split)
            register_pascal_voc(name, os.path.join(root, "VOC{}".format(year)), split, year)


_root = os.getenv("FSGD_DATASETS", os.getenv("DETECTRON2_DATASETS", "datasets"))
register_all_coco(_root)
register_all_lvis(_root)
register_all_cityscapes(_root)
register_all_pascal_voc(_root)
# register_all_ssigns intentionally not auto-registered (matches the
# reference, where the call is commented out in builtin.py)
