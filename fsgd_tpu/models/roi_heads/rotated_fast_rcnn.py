"""Rotated-box Fast R-CNN heads.

Parity with detectron2/modeling/roi_heads/rotated_fast_rcnn.py:46-298:
``RROIHeads`` (StandardROIHeads with ROIAlignRotated pooling, 5-dof
``Box2BoxTransformRotated`` regression, rotated IoU matching) and
``fast_rcnn_inference_rotated`` (clip + per-class rotated NMS) as a batched
static-shape program.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ...ops.box_transform import Box2BoxTransformRotated
from ...ops.nms import batched_nms_rotated_mask
from ...ops.rotated_iou import pairwise_iou_rotated
from ...structures import RotatedBoxes
from ..build import ROI_HEADS_REGISTRY
from ..poolers import ROIPooler
from .box_head import FastRCNNOutputLayers
from .fast_rcnn import predict_boxes, predict_probs
from .roi_heads import StandardROIHeads


def fast_rcnn_inference_rotated_batched(
    boxes, scores, image_sizes, proposal_valid, score_thresh, nms_thresh, topk_per_image,
    pre_nms_candidates: int = 1024,
):
    """(B, P, K, 5) rotated boxes + (B, P, K+1) probs -> padded detections."""
    b, p, k = scores.shape[0], scores.shape[1], scores.shape[2] - 1

    def per_image(boxes_i, scores_i, size_i, pvalid_i):
        fg_scores = scores_i[:, :k]
        if boxes_i.shape[1] == 1:
            boxes_k = jnp.broadcast_to(boxes_i, (p, k, 5))
        else:
            boxes_k = boxes_i
        clipped = RotatedBoxes(boxes_k.reshape(-1, 5)).clip((size_i[0], size_i[1])).tensor

        flat_scores = jnp.where(pvalid_i[:, None], fg_scores, 0.0).reshape(-1)
        n_cand = min(pre_nms_candidates, flat_scores.shape[0])
        cand_scores, cand_idx = jax.lax.top_k(flat_scores, n_cand)
        cand_valid = cand_scores > score_thresh
        cand_classes = (cand_idx % k).astype(jnp.int32)
        cand_boxes = clipped[cand_idx]

        keep = batched_nms_rotated_mask(cand_boxes, cand_scores, cand_classes, nms_thresh, cand_valid)
        kept_scores = jnp.where(keep, cand_scores, -jnp.inf)
        d = min(topk_per_image, n_cand)
        top_scores, idx = jax.lax.top_k(kept_scores, d)
        det_valid = top_scores > -jnp.inf
        out = {
            "boxes": cand_boxes[idx],
            "scores": jnp.where(det_valid, top_scores, 0.0),
            "classes": cand_classes[idx],
            "valid": det_valid,
        }
        if d < topk_per_image:
            pad = topk_per_image - d
            out = {
                key: jnp.concatenate([v, jnp.zeros((pad, *v.shape[1:]), v.dtype)], 0)
                for key, v in out.items()
            }
        return out

    return jax.vmap(per_image)(boxes, scores, image_sizes, proposal_valid)


@ROI_HEADS_REGISTRY.register()
class RROIHeads(StandardROIHeads):
    def __init__(self, cfg, input_shapes):
        super().__init__(cfg, input_shapes)
        self.box_dim = 5
        weights = cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS
        if len(weights) == 4:
            weights = tuple(weights) + (1.0,)
        self.box2box_transform = Box2BoxTransformRotated(weights=weights)
        assert not self.mask_on and not self.keypoint_on, "RROIHeads supports boxes only"

        shapes = [input_shapes[f] for f in self.in_features]
        scales = [1.0 / s.stride for s in shapes]
        rb = cfg.MODEL.ROI_BOX_HEAD
        assert rb.POOLER_TYPE == "ROIAlignRotated", "RROIHeads needs ROIAlignRotated"
        self.box_pooler = ROIPooler(rb.POOLER_RESOLUTION, scales, rb.POOLER_SAMPLING_RATIO, rb.POOLER_TYPE)
        self.box_predictor_module = FastRCNNOutputLayers(
            num_classes=self.num_classes,
            box_dim=5,
            cls_agnostic_bbox_reg=rb.CLS_AGNOSTIC_BBOX_REG,
            dtype=self.dtype,
        )

    def _pairwise_iou(self, gt_boxes, boxes):
        return pairwise_iou_rotated(gt_boxes, boxes)

    def forward_inference(self, params, features: Dict, proposals: Dict, batch: Dict):
        feats = [features[f] for f in self.in_features]
        boxes_in = proposals["boxes"]
        b, p = boxes_in.shape[:2]
        logits, deltas = self._box_forward(params, feats, boxes_in)
        probs = predict_probs(logits).reshape(b, p, -1)
        decoded = predict_boxes(
            self.box2box_transform, deltas, boxes_in.reshape(b * p, 5)
        ).reshape(b, p, -1, 5)
        return fast_rcnn_inference_rotated_batched(
            decoded, probs, batch["image_size"], proposals["valid"],
            self.score_thresh, self.nms_thresh, self.detections_per_image,
        )
