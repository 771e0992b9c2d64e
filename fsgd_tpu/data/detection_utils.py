"""Annotation/image utilities for the data pipeline.

Parity with detectron2/data/detection_utils.py:34-420: EXIF-safe image
reading with format conversion, annotation transforms, Instances
construction, empty-instance filtering, keypoint hflip indices, crop
generation around instances, metadata consistency checks, and the fork's
``build_transform_gen`` with the RESIZING / RANDOM_FLIPPING switches
(detection_utils.py:410-420: RESIZING=False -> fixed Resize((640, 640))).
"""

from __future__ import annotations

import logging
from typing import List

import numpy as np
from PIL import Image, ImageOps

from ..structures import Boxes, BoxMode, Instances, Keypoints, PolygonMasks, BitMasks
from .catalog import MetadataCatalog
from .transforms.transform import TransformList
from .transforms.transform_gen import RandomFlip, Resize, ResizeShortestEdge

logger = logging.getLogger(__name__)

__all__ = [
    "read_image",
    "transform_instance_annotations",
    "transform_keypoint_annotations",
    "annotations_to_instances",
    "annotations_to_instances_rotated",
    "filter_empty_instances",
    "create_keypoint_hflip_indices",
    "gen_crop_transform_with_instance",
    "check_metadata_consistency",
    "build_transform_gen",
]


def read_image(file_name: str, format: str = None) -> np.ndarray:
    """Read an image into (H, W, C) uint8, honoring EXIF rotation; supports
    BGR / RGB / L formats (detectron2 convention: BGR default)."""
    image = Image.open(file_name)
    try:
        image = ImageOps.exif_transpose(image)
    except Exception:
        pass
    if format is not None:
        conversion_format = format
        if format == "BGR":
            conversion_format = "RGB"
        image = image.convert(conversion_format)
    image = np.asarray(image)
    if format == "BGR":
        image = image[:, :, ::-1]
    if format == "L":
        image = np.expand_dims(image, -1)
    return image


def transform_instance_annotations(annotation, transforms, image_size, *, keypoint_hflip_indices=None):
    """Apply transforms to one annotation dict's box/segmentation/keypoints."""
    bbox = BoxMode.convert(annotation["bbox"], annotation["bbox_mode"], BoxMode.XYXY_ABS)
    bbox = transforms.apply_box(np.array([bbox]))[0]
    annotation["bbox"] = np.minimum(bbox, list(image_size + image_size)[::-1])
    annotation["bbox_mode"] = BoxMode.XYXY_ABS

    if "segmentation" in annotation:
        segm = annotation["segmentation"]
        if isinstance(segm, list):  # polygons
            polygons = [np.asarray(p).reshape(-1, 2) for p in segm]
            annotation["segmentation"] = [
                p.reshape(-1) for p in transforms.apply_polygons([poly.reshape(-1) for poly in polygons])
            ]
        elif isinstance(segm, dict):  # RLE
            from . import rle as rle_codec

            mask = rle_codec.decode(rle_codec.frPyObjects(segm, *segm["size"]))
            mask = transforms.apply_segmentation(mask)
            annotation["segmentation"] = mask
        else:
            raise ValueError("Unsupported segmentation type {}".format(type(segm)))

    if "keypoints" in annotation:
        annotation["keypoints"] = transform_keypoint_annotations(
            annotation["keypoints"], transforms, image_size, keypoint_hflip_indices
        )
    return annotation


def transform_keypoint_annotations(keypoints, transforms, image_size, keypoint_hflip_indices=None):
    keypoints = np.asarray(keypoints, dtype="float64").reshape(-1, 3)
    keypoints[:, :2] = transforms.apply_coords(keypoints[:, :2])

    # flip the left/right semantic labels when an odd number of hflips occurred
    from .transforms.transform import HFlipTransform

    tf_list = transforms.transforms if isinstance(transforms, TransformList) else [transforms]
    do_hflip = sum(isinstance(t, HFlipTransform) for t in tf_list) % 2 == 1
    if do_hflip:
        assert keypoint_hflip_indices is not None
        keypoints = keypoints[keypoint_hflip_indices, :]

    # outside-image keypoints become unlabeled
    keypoints[keypoints[:, 0] < 0, 2] = 0
    keypoints[keypoints[:, 1] < 0, 2] = 0
    keypoints[keypoints[:, 0] > image_size[1], 2] = 0
    keypoints[keypoints[:, 1] > image_size[0], 2] = 0
    return keypoints


def annotations_to_instances(annos, image_size, mask_format="polygon") -> Instances:
    boxes = np.stack(
        [BoxMode.convert(obj["bbox"], obj["bbox_mode"], BoxMode.XYXY_ABS) for obj in annos]
    ) if len(annos) else np.zeros((0, 4))
    target = Instances(image_size)
    target.gt_boxes = Boxes(boxes)
    target.gt_classes = np.array([int(obj["category_id"]) for obj in annos], dtype=np.int64)

    if len(annos) and "segmentation" in annos[0]:
        segms = [obj["segmentation"] for obj in annos]
        if mask_format == "polygon":
            target.gt_masks = PolygonMasks([
                [np.asarray(p, np.float64) for p in segm] if isinstance(segm, list) else segm
                for segm in segms
            ])
        else:
            from ..structures.masks import polygons_to_bitmask

            masks = []
            for segm in segms:
                if isinstance(segm, list):
                    masks.append(polygons_to_bitmask([np.asarray(p) for p in segm], *image_size))
                elif isinstance(segm, np.ndarray):
                    masks.append(segm.astype(bool))
                else:
                    from . import rle as rle_codec

                    masks.append(rle_codec.decode(segm).astype(bool))
            target.gt_masks = BitMasks(np.stack(masks) if masks else np.zeros((0, *image_size), bool))

    if len(annos) and "keypoints" in annos[0]:
        target.gt_keypoints = Keypoints(np.stack([np.asarray(obj.get("keypoints")).reshape(-1, 3) for obj in annos]))
    return target


def annotations_to_instances_rotated(annos, image_size) -> Instances:
    from ..structures import RotatedBoxes

    boxes = [obj["bbox"] for obj in annos]
    target = Instances(image_size)
    target.gt_boxes = RotatedBoxes(np.asarray(boxes).reshape(-1, 5))
    target.gt_classes = np.array([int(obj["category_id"]) for obj in annos], dtype=np.int64)
    return target


def filter_empty_instances(instances: Instances, by_box=True, by_mask=True) -> Instances:
    r = []
    if by_box:
        r.append(np.asarray(instances.gt_boxes.nonempty()))
    if instances.has("gt_masks") and by_mask:
        r.append(np.asarray(instances.gt_masks.nonempty()))
    if not r:
        return instances
    m = r[0]
    for x in r[1:]:
        m = m & x
    return instances[m]


def create_keypoint_hflip_indices(dataset_names) -> np.ndarray:
    check_metadata_consistency("keypoint_names", dataset_names)
    check_metadata_consistency("keypoint_flip_map", dataset_names)
    meta = MetadataCatalog.get(dataset_names[0])
    names = meta.keypoint_names
    flip_map = dict(meta.keypoint_flip_map)
    flip_map.update({v: k for k, v in flip_map.items()})
    flipped_names = [i if i not in flip_map else flip_map[i] for i in names]
    return np.asarray([names.index(i) for i in flipped_names])


def gen_crop_transform_with_instance(crop_size, image_size, instance):
    """Random crop containing the given instance's center (reference :333-355)."""
    from .transforms.transform import CropTransform

    crop_size = np.asarray(crop_size, dtype=np.int32)
    bbox = BoxMode.convert(instance["bbox"], instance["bbox_mode"], BoxMode.XYXY_ABS)
    center_yx = (bbox[1] + bbox[3]) * 0.5, (bbox[0] + bbox[2]) * 0.5
    assert image_size[0] >= center_yx[0] and image_size[1] >= center_yx[1]

    min_yx = np.maximum(np.floor(center_yx).astype(np.int32) - crop_size, 0)
    max_yx = np.maximum(np.asarray(image_size, dtype=np.int32) - crop_size, 0)
    max_yx = np.minimum(max_yx, np.ceil(center_yx).astype(np.int32))

    y0 = np.random.randint(min_yx[0], max_yx[0] + 1)
    x0 = np.random.randint(min_yx[1], max_yx[1] + 1)
    return CropTransform(x0, y0, crop_size[1], crop_size[0])


def check_metadata_consistency(key, dataset_names):
    if len(dataset_names) == 0:
        return
    entries_per_dataset = [getattr(MetadataCatalog.get(d), key) for d in dataset_names]
    for idx, entry in enumerate(entries_per_dataset):
        if entry != entries_per_dataset[0]:
            raise ValueError(
                "Datasets have different metadata '{}': {} vs {}".format(
                    key, dataset_names[idx], dataset_names[0]
                )
            )


def build_transform_gen(cfg, is_train: bool):
    """Resize + flip gens from config, with the fork's overfit switches."""
    if is_train:
        min_size = cfg.INPUT.MIN_SIZE_TRAIN
        max_size = cfg.INPUT.MAX_SIZE_TRAIN
        sample_style = cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING
    else:
        min_size = cfg.INPUT.MIN_SIZE_TEST
        max_size = cfg.INPUT.MAX_SIZE_TEST
        sample_style = "choice"
    if sample_style == "range":
        assert len(min_size) == 2, "more than 2 ({}) min_size(s) are provided for ranges".format(len(min_size))

    tfm_gens = []
    if cfg.INPUT.RESIZING:
        tfm_gens.append(ResizeShortestEdge(min_size, max_size, sample_style))
    else:
        # fork switch (detection_utils.py:410-420): fixed square resize
        tfm_gens.append(Resize((640, 640)))
    if is_train and cfg.INPUT.RANDOM_FLIPPING:
        tfm_gens.append(RandomFlip())
    return tfm_gens
