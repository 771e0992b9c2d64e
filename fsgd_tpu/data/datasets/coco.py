"""COCO-format dataset loading.

Parity with detectron2/data/datasets/coco.py:30-566: ``load_coco_json``
(annotation filtering, id remapping, the standard dict format),
``register_coco_instances``, ``load_sem_seg``, ``convert_to_coco_dict/json``,
plus the fork's toy/noisy-label subset builders
(``build_toy_dataset_coco`` 20% subsample, ``build_noisy_label_dataset_coco``).
"""

from __future__ import annotations

import datetime
import json
import logging
import os
from typing import Dict, List, Optional

import numpy as np

from ...structures import BoxMode
from ..catalog import DatasetCatalog, MetadataCatalog
from ..cocoapi import COCO

logger = logging.getLogger(__name__)

__all__ = [
    "load_coco_json",
    "register_coco_instances",
    "load_sem_seg",
    "convert_to_coco_dict",
    "convert_to_coco_json",
    "build_toy_dataset_coco",
    "build_noisy_label_dataset_coco",
]


def load_coco_json(json_file, image_root, dataset_name=None, extra_annotation_keys=None):
    """Load a COCO-format json into the standard list-of-dicts format."""
    coco_api = COCO(json_file)

    id_map = None
    if dataset_name is not None:
        meta = MetadataCatalog.get(dataset_name)
        cat_ids = sorted(coco_api.getCatIds())
        cats = coco_api.loadCats(cat_ids)
        thing_classes = [c["name"] for c in sorted(cats, key=lambda x: x["id"])]
        meta.thing_classes = thing_classes
        id_map = {v: i for i, v in enumerate(cat_ids)}
        meta.thing_dataset_id_to_contiguous_id = id_map

    img_ids = sorted(coco_api.imgs.keys())
    imgs = coco_api.loadImgs(img_ids)
    anns = [coco_api.imgToAnns[img_id] for img_id in img_ids]
    total_num_anns = len(coco_api.anns)
    logger.info("Loaded %d images in COCO format from %s", len(imgs), json_file)

    dataset_dicts = []
    ann_keys = ["iscrowd", "bbox", "keypoints", "category_id"] + (extra_annotation_keys or [])
    num_without_valid_segmentation = 0

    for img_dict, anno_dict_list in zip(imgs, anns):
        record = {
            "file_name": os.path.join(image_root, img_dict["file_name"]),
            "height": img_dict["height"],
            "width": img_dict["width"],
            "image_id": img_dict["id"],
        }
        objs = []
        for anno in anno_dict_list:
            assert anno["image_id"] == record["image_id"]
            obj = {key: anno[key] for key in ann_keys if key in anno}

            segm = anno.get("segmentation", None)
            if segm is not None:
                if not isinstance(segm, dict):
                    # polygons: filter invalid (< 3 points)
                    segm = [poly for poly in segm if len(poly) % 2 == 0 and len(poly) >= 6]
                    if len(segm) == 0:
                        num_without_valid_segmentation += 1
                        continue
                obj["segmentation"] = segm

            keypts = anno.get("keypoints", None)
            if keypts:
                keypts = list(keypts)
                for idx, v in enumerate(keypts):
                    if idx % 3 != 2:
                        # COCO stores integer pixel indices; +0.5 converts to
                        # the continuous coordinate convention
                        keypts[idx] = v + 0.5
                obj["keypoints"] = keypts

            obj["bbox_mode"] = BoxMode.XYWH_ABS
            if id_map:
                obj["category_id"] = id_map[obj["category_id"]]
            objs.append(obj)
        record["annotations"] = objs
        dataset_dicts.append(record)

    if num_without_valid_segmentation > 0:
        logger.warning(
            "Filtered out %d instances without valid segmentation", num_without_valid_segmentation
        )
    del total_num_anns
    return dataset_dicts


def register_coco_instances(name, metadata, json_file, image_root):
    DatasetCatalog.register(name, lambda: load_coco_json(json_file, image_root, name))
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="coco", **metadata
    )


def merge_to_panoptic(detection_dicts, sem_seg_dicts):
    """Join detection and semantic-seg dataset dicts on ``file_name``
    (reference register_coco.py:102-124)."""
    sem_seg_by_file = {x["file_name"]: x for x in sem_seg_dicts}
    assert len(sem_seg_by_file) > 0
    results = []
    for det in detection_dicts:
        merged = dict(det)
        merged.update(sem_seg_by_file[merged["file_name"]])
        results.append(merged)
    return results


def register_coco_panoptic_separated(
    name, metadata, image_root, panoptic_root, panoptic_json, sem_seg_root, instances_json
):
    """Register the PanopticFPN "separated" format (reference
    register_coco.py:41-100): instance annotations from the detection task +
    semantic PNGs converted from panoptic annotations (things -> id 0, stuff
    contiguous in [1, #stuff]).  Also registers ``name + '_stuffonly'``."""
    panoptic_name = name + "_separated"
    DatasetCatalog.register(
        panoptic_name,
        lambda: merge_to_panoptic(
            load_coco_json(instances_json, image_root, panoptic_name),
            load_sem_seg(sem_seg_root, image_root),
        ),
    )
    MetadataCatalog.get(panoptic_name).set(
        panoptic_root=panoptic_root,
        image_root=image_root,
        panoptic_json=panoptic_json,
        sem_seg_root=sem_seg_root,
        json_file=instances_json,
        evaluator_type="coco_panoptic_seg",
        **metadata
    )

    semantic_name = name + "_stuffonly"
    DatasetCatalog.register(semantic_name, lambda: load_sem_seg(sem_seg_root, image_root))
    MetadataCatalog.get(semantic_name).set(
        sem_seg_root=sem_seg_root, image_root=image_root, evaluator_type="sem_seg", **metadata
    )


def build_toy_dataset_coco(dataset_dicts, fraction: float = 0.2, seed: int = 42):
    """Deterministic subsample for overfit experiments
    (fork's build_toy_dataset_coco, reference coco.py:390-455)."""
    rng = np.random.RandomState(seed)
    n = max(int(len(dataset_dicts) * fraction), 1)
    idx = rng.choice(len(dataset_dicts), size=n, replace=False)
    return [dataset_dicts[i] for i in sorted(idx)]


def build_noisy_label_dataset_coco(dataset_dicts, noise_fraction: float = 0.2, num_classes: int = 80, seed: int = 42):
    """Randomly corrupt a fraction of labels (fork's noisy-label builder)."""
    rng = np.random.RandomState(seed)
    out = []
    for record in dataset_dicts:
        record = dict(record)
        annos = []
        for obj in record.get("annotations", []):
            obj = dict(obj)
            if rng.rand() < noise_fraction:
                obj["category_id"] = int(rng.randint(num_classes))
            annos.append(obj)
        record["annotations"] = annos
        out.append(record)
    return out


def load_sem_seg(gt_root, image_root, gt_ext="png", image_ext="jpg"):
    """Pair image files with semantic-seg GT files by basename."""

    def file2id(folder_path, file_path):
        image_id = os.path.normpath(os.path.relpath(file_path, start=folder_path))
        return os.path.splitext(image_id)[0]

    input_files = sorted(
        (os.path.join(image_root, f) for f in os.listdir(image_root) if f.endswith(image_ext)),
        key=lambda p: file2id(image_root, p),
    )
    gt_files = sorted(
        (os.path.join(gt_root, f) for f in os.listdir(gt_root) if f.endswith(gt_ext)),
        key=lambda p: file2id(gt_root, p),
    )
    assert len(gt_files) > 0, "No annotations found in {}".format(gt_root)
    if len(input_files) != len(gt_files):
        input_basenames = {file2id(image_root, f) for f in input_files}
        gt_basenames = {file2id(gt_root, f) for f in gt_files}
        intersect = sorted(input_basenames & gt_basenames)
        logger.warning("Directory sizes differ; using %d intersecting files", len(intersect))
        input_files = [os.path.join(image_root, f + "." + image_ext) for f in intersect]
        gt_files = [os.path.join(gt_root, f + "." + gt_ext) for f in intersect]
    return [
        {"file_name": img, "sem_seg_file_name": gt}
        for img, gt in zip(input_files, gt_files)
    ]


def convert_to_coco_dict(dataset_name: str) -> Dict:
    """Convert a registered dataset back into COCO-json format
    (reference coco.py:278-388)."""
    dataset_dicts = DatasetCatalog.get(dataset_name)
    metadata = MetadataCatalog.get(dataset_name)
    if hasattr(metadata, "thing_dataset_id_to_contiguous_id"):
        reverse_id_mapping = {v: k for k, v in metadata.thing_dataset_id_to_contiguous_id.items()}
        reverse_id = lambda contiguous_id: reverse_id_mapping[contiguous_id]  # noqa: E731
    else:
        reverse_id = lambda contiguous_id: contiguous_id  # noqa: E731

    categories = [
        {"id": reverse_id(i), "name": name} for i, name in enumerate(metadata.thing_classes)
    ]
    coco_images = []
    coco_annotations = []
    for image_id, image_dict in enumerate(dataset_dicts):
        coco_image = {
            "id": image_dict.get("image_id", image_id),
            "width": image_dict["width"],
            "height": image_dict["height"],
            "file_name": image_dict["file_name"],
        }
        coco_images.append(coco_image)
        for annotation in image_dict.get("annotations", []):
            coco_annotation = {}
            bbox = annotation["bbox"]
            bbox_mode = annotation["bbox_mode"]
            bbox = BoxMode.convert(bbox, bbox_mode, BoxMode.XYWH_ABS)
            if "segmentation" in annotation:
                seg = annotation["segmentation"]
                coco_annotation["segmentation"] = seg
                if isinstance(seg, list):
                    from ...structures.masks import PolygonMasks

                    area = float(PolygonMasks([seg]).area()[0])
                else:
                    from .. import rle as rle_codec

                    area = float(rle_codec.area(rle_codec.frPyObjects(seg, coco_image["height"], coco_image["width"])))
            else:
                area = bbox[2] * bbox[3]
            coco_annotation["id"] = len(coco_annotations) + 1
            coco_annotation["image_id"] = coco_image["id"]
            coco_annotation["bbox"] = [round(float(x), 3) for x in bbox]
            coco_annotation["area"] = area
            coco_annotation["category_id"] = reverse_id(annotation["category_id"])
            coco_annotation["iscrowd"] = annotation.get("iscrowd", 0)
            if "keypoints" in annotation:
                kp = list(annotation["keypoints"])
                for idx, v in enumerate(kp):
                    if idx % 3 != 2:
                        kp[idx] = v - 0.5
                coco_annotation["keypoints"] = kp
                coco_annotation["num_keypoints"] = sum(k > 0 for k in kp[2::3])
            coco_annotations.append(coco_annotation)

    return {
        "info": {"date_created": str(datetime.datetime.now()), "description": "fsgd_tpu conversion of {}".format(dataset_name)},
        "images": coco_images,
        "annotations": coco_annotations,
        "categories": categories,
        "licenses": None,
    }


def convert_to_coco_json(dataset_name: str, output_file: str):
    coco_dict = convert_to_coco_dict(dataset_name)
    os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
    with open(output_file, "w") as f:
        json.dump(coco_dict, f)
