"""DensePose dataset mapper + padded batch collation.

Parity target: projects/DensePose/densepose/dataset_mapper.py:15-118 (the
customized ``DatasetMapper`` that validates/transforms ``dp_*`` annotations
into per-instance ``DensePoseDataRelative``) plus the TPU-specific step the
reference does not need: flattening the variable-length chart annotations
into the padded static batch contract consumed by ``DensePoseROIHeads``
(``roi_head.py:7-12``):

    dp_points (B, G, P, 4): x, y in input-image coords, patch index, pad
    dp_uv     (B, G, P, 2)
    dp_valid  (B, G, P)
    dp_segm   (B, G, S, S): coarse part labels rasterized over the GT box
"""

from __future__ import annotations

import copy
import logging
import os
from typing import Dict, List

import numpy as np

from fsgd_tpu.data import detection_utils as utils
from fsgd_tpu.data.build import TrainLoader
from fsgd_tpu.data.dataset_mapper import DatasetMapper
from fsgd_tpu.data.transforms.transform_gen import apply_transform_gens

from .structures import DensePoseDataRelative, DensePoseList, DensePoseTransformData

logger = logging.getLogger(__name__)

__all__ = ["DensePoseDatasetMapper", "DensePoseTrainLoader", "dp_annotations_to_batch_arrays"]


def _load_transform_data(cfg) -> DensePoseTransformData:
    """UV symmetry tables: exact when the .mat asset is reachable via
    $FSGD_DENSEPOSE_DATA (reference dataset_mapper.py:36-50 resolves
    ``densepose_transform_src`` through PathManager), identity otherwise."""
    root = os.environ.get("FSGD_DENSEPOSE_DATA", "")
    fpath = os.path.join(root, "UV_symmetry_transforms.mat")
    if root and os.path.isfile(fpath):
        return DensePoseTransformData.load(fpath)
    return DensePoseTransformData.default()


class DensePoseDatasetMapper(DatasetMapper):
    """DatasetMapper that also carries DensePose chart annotations."""

    def __init__(self, cfg, is_train: bool = True):
        super().__init__(cfg, is_train)
        self.densepose_on = cfg.MODEL.get("DENSEPOSE_ON", True)
        if self.densepose_on:
            self.densepose_transform_data = _load_transform_data(cfg)

    def __call__(self, dataset_dict):
        dataset_dict = copy.deepcopy(dataset_dict)
        image = utils.read_image(dataset_dict["file_name"], format=self.img_format)
        image, transforms = apply_transform_gens(self.tfm_gens, image)
        image_shape = image.shape[:2]
        dataset_dict["image"] = np.ascontiguousarray(image.astype(np.float32))

        if not self.is_train:
            dataset_dict.pop("annotations", None)
            return dataset_dict

        for anno in dataset_dict.get("annotations", []):
            if not self.mask_on:
                anno.pop("segmentation", None)
            if not self.keypoint_on:
                anno.pop("keypoints", None)

        annos = [
            self._transform_densepose(
                utils.transform_instance_annotations(
                    obj, transforms, image_shape,
                    keypoint_hflip_indices=self.keypoint_hflip_indices,
                ),
                transforms,
            )
            for obj in dataset_dict.pop("annotations", [])
            if obj.get("iscrowd", 0) == 0
        ]
        instances = utils.annotations_to_instances(annos, image_shape, mask_format=self.mask_format)
        if len(annos) and any("densepose" in a for a in annos):
            # parallel list, None where the instance has no chart annotation
            instances.gt_densepose = DensePoseList([a.get("densepose") for a in annos])
        dataset_dict["instances"] = utils.filter_empty_instances(instances)
        return dataset_dict

    def _transform_densepose(self, annotation, transforms):
        if not self.densepose_on:
            return annotation
        is_valid, _ = DensePoseDataRelative.validate_annotation(annotation)
        if is_valid:
            densepose_data = DensePoseDataRelative(annotation, cleanup=True)
            densepose_data.apply_transform(transforms, self.densepose_transform_data)
            annotation["densepose"] = densepose_data
        else:
            DensePoseDataRelative.cleanup_annotation(annotation)
            annotation["densepose"] = None
        return annotation


def dp_annotations_to_batch_arrays(
    mapped: List[Dict], max_gt: int, max_points: int, heatmap_size: int
) -> Dict[str, np.ndarray]:
    """Flatten per-instance DensePose annotations into padded arrays.

    Point coords become absolute input-image coordinates (the loss maps them
    into heatmap space from the proposal box, ``densepose_head.py:121-126``);
    the 256x256 coarse segm is nearest-resampled to the (S, S) heatmap grid
    over the GT box — matching how the reference loss rasterizes GT onto the
    box-aligned heatmap (reference densepose_head.py:504-560).
    """
    import cv2

    b = len(mapped)
    pts = np.zeros((b, max_gt, max_points, 4), np.float32)
    uv = np.zeros((b, max_gt, max_points, 2), np.float32)
    valid = np.zeros((b, max_gt, max_points), bool)
    segm = np.zeros((b, max_gt, heatmap_size, heatmap_size), np.int32)
    for bi, x in enumerate(mapped):
        inst = x.get("instances")
        if inst is None or not inst.has("gt_densepose"):
            continue
        boxes = np.asarray(inst.gt_boxes.tensor)
        for gi, dp in enumerate(inst.gt_densepose[:max_gt]):
            if dp is None:
                continue
            x1, y1, x2, y2 = boxes[gi]
            w, h = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
            n = min(len(dp.x), max_points)
            pts[bi, gi, :n, 0] = x1 + dp.x[:n] / DensePoseDataRelative.MASK_SIZE * w
            pts[bi, gi, :n, 1] = y1 + dp.y[:n] / DensePoseDataRelative.MASK_SIZE * h
            pts[bi, gi, :n, 2] = dp.i[:n]
            uv[bi, gi, :n, 0] = dp.u[:n]
            uv[bi, gi, :n, 1] = dp.v[:n]
            valid[bi, gi, :n] = True
            segm[bi, gi] = cv2.resize(
                dp.segm, (heatmap_size, heatmap_size), interpolation=cv2.INTER_NEAREST
            ).astype(np.int32)
    return {"dp_points": pts, "dp_uv": uv, "dp_valid": valid, "dp_segm": segm}


class DensePoseTrainLoader(TrainLoader):
    """TrainLoader whose collate also emits the dp_* contract."""

    def __init__(self, dataset_dicts, mapper, sampler, batch_size, cfg, prefetch: int = 2):
        super().__init__(dataset_dicts, mapper, sampler, batch_size, cfg, prefetch)
        dp = cfg.MODEL.ROI_DENSEPOSE_HEAD
        self.dp_max_points = dp.MAX_POINTS
        self.dp_heatmap_size = dp.HEATMAP_SIZE

    def collate(self, mapped, bucket):
        batch = super().collate(mapped, bucket)
        batch.update(
            dp_annotations_to_batch_arrays(
                mapped, self.max_gt, self.dp_max_points, self.dp_heatmap_size
            )
        )
        return batch


def build_densepose_train_loader(cfg):
    """Reference train_net.py:33-36 ``build_detection_train_loader(mapper=DatasetMapper(cfg, True))``."""
    from fsgd_tpu.data.build import get_detection_dataset_dicts
    from fsgd_tpu.data.samplers import TrainingSampler

    dataset_dicts = get_detection_dataset_dicts(
        cfg.DATASETS.TRAIN,
        filter_empty=cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS,
        min_keypoints=0,
        proposal_files=None,
    )
    mapper = DensePoseDatasetMapper(cfg, True)
    sampler = TrainingSampler(len(dataset_dicts), seed=cfg.SEED if cfg.SEED >= 0 else None)
    return DensePoseTrainLoader(
        dataset_dicts, mapper, sampler, cfg.SOLVER.IMS_PER_BATCH, cfg
    )
