"""Rotated RPN.

Parity with detectron2/modeling/proposal_generator/rrpn.py:16-60 +
rrpn_outputs.py: the RPN with 5-dof anchors (RotatedAnchorGenerator),
``Box2BoxTransformRotated`` deltas, rotated IoU matching and rotated NMS.
Implemented as RPN with the box-type hooks overridden.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ...ops.box_transform import Box2BoxTransformRotated
from ...ops.nms import nms_rotated_mask
from ...ops.rotated_iou import pairwise_iou_rotated
from ...structures import RotatedBoxes
from ..build import PROPOSAL_GENERATOR_REGISTRY
from .rpn import RPN


@PROPOSAL_GENERATOR_REGISTRY.register()
class RRPN(RPN):
    def __init__(self, cfg, input_shapes: Dict[str, Any]):
        # force the rotated anchor generator for this proposal generator
        cfg = cfg.clone()
        if cfg.is_frozen():
            cfg.defrost()
        cfg.MODEL.ANCHOR_GENERATOR.NAME = "RotatedAnchorGenerator"
        super().__init__(cfg, input_shapes)
        assert self.box_dim == 5
        weights = cfg.MODEL.RPN.BBOX_REG_WEIGHTS
        if len(weights) == 4:
            weights = tuple(weights) + (1.0,)
        self.box2box_transform = Box2BoxTransformRotated(weights=weights)
        # rotated NMS is quadratic in a heavier constant; keep the cap tighter
        self.nms_cap = 2000

    def _pairwise_iou(self, gt_boxes, anchors):
        return pairwise_iou_rotated(gt_boxes, anchors)

    def _match_anchors(self, gt_boxes, gt_valid, anchors_cat):
        # dense path: rotated IoU (polygon clipping) is compute-bound, so the
        # streamed matcher's recompute-into-reductions trade is a loss here
        quality = self._pairwise_iou(gt_boxes, anchors_cat)
        matches, labels = self.anchor_matcher(quality, gt_valid)
        return matches, labels

    def _clip_boxes(self, boxes, image_size):
        return RotatedBoxes(boxes).clip((image_size[0], image_size[1])).tensor

    def _nonempty(self, boxes):
        return (boxes[:, 2] > self.min_box_side_len) & (boxes[:, 3] > self.min_box_side_len)

    def _nms(self, boxes, scores, valid):
        return nms_rotated_mask(boxes, scores, self.nms_thresh, valid=valid)

    def _inside_image(self, anchors_cat, image_size, thresh):
        return RotatedBoxes(anchors_cat).inside_box((image_size[0], image_size[1]), thresh)
