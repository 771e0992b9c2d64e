"""Test-time augmentation.

Parity with detectron2/modeling/test_time_augmentation.py:21-248:
``DatasetMapperTTA`` (multi-scale + horizontal-flip variants of one input)
and ``GeneralizedRCNNWithTTA`` (run inference per augmentation, map boxes
back to the original frame, merge with class-aware NMS, keep top-k).
"""

from __future__ import annotations

import copy
from itertools import count
from typing import Dict, List

import numpy as np

from ..data.detection_utils import read_image  # noqa: F401 (api surface)
from ..data.transforms.transform import HFlipTransform, NoOpTransform, ResizeTransform
from ..data.transforms.transform_gen import RandomFlip, ResizeShortestEdge, apply_transform_gens
from ..ops.nms import batched_nms
from ..structures import Boxes, Instances

__all__ = ["DatasetMapperTTA", "GeneralizedRCNNWithTTA"]


class DatasetMapperTTA:
    """Map one dataset dict into its list of augmented versions."""

    def __init__(self, cfg):
        self.min_sizes = list(cfg.TEST.AUG.MIN_SIZES)
        self.max_size = cfg.TEST.AUG.MAX_SIZE
        self.flip = cfg.TEST.AUG.FLIP

    def __call__(self, dataset_dict) -> List[Dict]:
        ret = []
        image = np.asarray(dataset_dict["image"])
        if image.ndim == 3 and image.shape[0] in (1, 3) and image.shape[0] < image.shape[2]:
            image = np.transpose(image, (1, 2, 0))
        for min_size in self.min_sizes:
            tfm_gens = [ResizeShortestEdge(min_size, self.max_size)]
            flips = [False, True] if self.flip else [False]
            for flip in flips:
                gens = list(tfm_gens) + ([RandomFlip(prob=1.0)] if flip else [])
                new_image, tfms = apply_transform_gens(gens, np.copy(image))
                dic = copy.deepcopy(dataset_dict)
                dic["image"] = new_image.astype(np.float32)
                dic["transforms"] = tfms
                ret.append(dic)
        return ret


class GeneralizedRCNNWithTTA:
    def __init__(self, cfg, model, tta_mapper=None, batch_size: int = 1):
        self.cfg = cfg.clone()
        self.model = model
        self.tta_mapper = tta_mapper or DatasetMapperTTA(cfg)
        self.batch_size = batch_size
        self.training = False

    def eval(self):
        return self

    def __call__(self, batched_inputs: List[Dict]) -> List[Dict]:
        return [self._inference_one_image(x) for x in batched_inputs]

    def _inference_one_image(self, input_dict: Dict) -> Dict:
        augmented_inputs = self.tta_mapper(input_dict)
        orig_h = input_dict.get("height", np.asarray(input_dict["image"]).shape[0])
        orig_w = input_dict.get("width", np.asarray(input_dict["image"]).shape[1])

        all_boxes, all_scores, all_classes = [], [], []
        for aug_input in augmented_inputs:
            tfms = aug_input.pop("transforms")
            aug_input["height"], aug_input["width"] = orig_h, orig_w
            outputs = self.model([aug_input])
            if isinstance(outputs, tuple):
                outputs = outputs[3]
            inst = outputs[0]["instances"]
            boxes = np.asarray(inst.pred_boxes.tensor)
            # the model already rescaled boxes to (orig_h, orig_w); undo flips
            # by checking for an odd number of HFlipTransforms in the chain
            num_flips = sum(isinstance(t, HFlipTransform) for t in getattr(tfms, "transforms", [tfms]))
            if num_flips % 2 == 1:
                flipped = boxes.copy()
                flipped[:, 0] = orig_w - boxes[:, 2]
                flipped[:, 2] = orig_w - boxes[:, 0]
                boxes = flipped
            all_boxes.append(boxes)
            all_scores.append(np.asarray(inst.scores))
            all_classes.append(np.asarray(inst.pred_classes))

        boxes = np.concatenate(all_boxes, axis=0).astype(np.float32)
        scores = np.concatenate(all_scores, axis=0).astype(np.float32)
        classes = np.concatenate(all_classes, axis=0)
        if len(boxes) == 0:
            return {"instances": Instances((orig_h, orig_w), pred_boxes=Boxes(boxes), scores=scores, pred_classes=classes)}

        keep = batched_nms(boxes, scores, classes, self.cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST)
        keep = keep[: self.cfg.TEST.DETECTIONS_PER_IMAGE]
        result = Instances((orig_h, orig_w))
        result.pred_boxes = Boxes(boxes[keep])
        result.scores = scores[keep]
        result.pred_classes = classes[keep]
        return {"instances": result}
