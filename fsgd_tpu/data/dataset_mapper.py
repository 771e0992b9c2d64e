"""DatasetMapper: dataset dict -> per-image model input.

Parity with detectron2/data/dataset_mapper.py:19-146: read image, apply
crop/resize/flip gens, transform annotations into Instances (polygon or
bitmask GT), keypoints, optional precomputed proposals, sem-seg GT.
"""

from __future__ import annotations

import copy
import logging

import numpy as np

from ..structures import BoxMode
from . import detection_utils as utils
from .transforms.transform_gen import apply_transform_gens

logger = logging.getLogger(__name__)

__all__ = ["DatasetMapper"]


class DatasetMapper:
    def __init__(self, cfg, is_train: bool = True):
        if cfg.INPUT.CROP.ENABLED and is_train:
            from .transforms.transform_gen import RandomCrop

            self.crop_gen = RandomCrop(cfg.INPUT.CROP.TYPE, cfg.INPUT.CROP.SIZE)
            logger.info("CropGen used in training: %s", str(self.crop_gen))
        else:
            self.crop_gen = None

        self.tfm_gens = utils.build_transform_gen(cfg, is_train)
        self.img_format = cfg.INPUT.FORMAT
        self.mask_on = cfg.MODEL.MASK_ON
        self.mask_format = cfg.INPUT.MASK_FORMAT
        self.keypoint_on = cfg.MODEL.KEYPOINT_ON
        self.load_proposals = cfg.MODEL.LOAD_PROPOSALS
        if self.keypoint_on and is_train:
            self.keypoint_hflip_indices = utils.create_keypoint_hflip_indices(cfg.DATASETS.TRAIN)
        else:
            self.keypoint_hflip_indices = None
        self.is_train = is_train

    def __call__(self, dataset_dict):
        dataset_dict = copy.deepcopy(dataset_dict)
        image = utils.read_image(dataset_dict["file_name"], format=self.img_format)
        if "width" in dataset_dict and "height" in dataset_dict:
            expected = (dataset_dict["height"], dataset_dict["width"])
            if image.shape[:2] != expected:
                raise ValueError(
                    "Image size mismatch for {}: {} vs {}".format(
                        dataset_dict["file_name"], image.shape[:2], expected
                    )
                )

        if "annotations" not in dataset_dict:
            image, transforms = apply_transform_gens(
                ([self.crop_gen] if self.crop_gen else []) + self.tfm_gens, image
            )
        else:
            if self.crop_gen:
                crop_tfm = utils.gen_crop_transform_with_instance(
                    self.crop_gen.get_crop_size(image.shape[:2]),
                    image.shape[:2],
                    np.random.choice(dataset_dict["annotations"]),
                )
                image = crop_tfm.apply_image(image)
            image, transforms = apply_transform_gens(self.tfm_gens, image)
            if self.crop_gen:
                transforms = crop_tfm + transforms

        image_shape = image.shape[:2]
        dataset_dict["image"] = np.ascontiguousarray(image.astype(np.float32))

        if self.load_proposals and "proposal_boxes" in dataset_dict:
            boxes = transforms.apply_box(
                BoxMode.convert(
                    dataset_dict.pop("proposal_boxes"),
                    dataset_dict.pop("proposal_bbox_mode"),
                    BoxMode.XYXY_ABS,
                )
            )
            dataset_dict["proposals"] = {
                "boxes": boxes,
                "objectness_logits": dataset_dict.pop("proposal_objectness_logits"),
            }

        if not self.is_train:
            dataset_dict.pop("annotations", None)
            dataset_dict.pop("sem_seg_file_name", None)
            return dataset_dict

        if "annotations" in dataset_dict:
            for anno in dataset_dict["annotations"]:
                if not self.mask_on:
                    anno.pop("segmentation", None)
                if not self.keypoint_on:
                    anno.pop("keypoints", None)
            annos = [
                utils.transform_instance_annotations(
                    obj, transforms, image_shape, keypoint_hflip_indices=self.keypoint_hflip_indices
                )
                for obj in dataset_dict.pop("annotations")
                if obj.get("iscrowd", 0) == 0
            ]
            instances = utils.annotations_to_instances(annos, image_shape, mask_format=self.mask_format)
            dataset_dict["instances"] = utils.filter_empty_instances(instances)

        if "sem_seg_file_name" in dataset_dict:
            sem_seg_gt = utils.read_image(dataset_dict.pop("sem_seg_file_name"), "L")[:, :, 0]
            sem_seg_gt = transforms.apply_segmentation(sem_seg_gt)
            dataset_dict["sem_seg"] = sem_seg_gt.astype("int64")
        return dataset_dict
