"""ROI heads: proposal labeling/sampling + box/mask/keypoint branches.

Parity with detectron2/modeling/roi_heads/roi_heads.py:120-719
(``ROIHeads.label_and_sample_proposals`` with the [0.5] matcher and 512/img
25%-fg sampling, ``StandardROIHeads`` with separate pooled branches,
``Res5ROIHeads`` with the shared res5 transform) and
proposal_utils.py:8-34 (``add_ground_truth_to_proposals``).

TPU design: sampling is a vmapped static-shape program — proposals and GT are
padded with validity masks, the sampled minibatch is always exactly
``BATCH_SIZE_PER_IMAGE`` slots (invalid slots masked out of every loss), and
the mask/keypoint branches run on a fixed ``max_fg`` subset selected by
top-k on the foreground mask.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...layers import ShapeSpec
from ...ops.box_transform import Box2BoxTransform
from ...ops.matcher import Matcher
from ...ops.sampling import subsample_labels
from ...structures import pairwise_iou
from ..build import (
    ROI_BOX_HEAD_REGISTRY,
    ROI_HEADS_REGISTRY,
    ROI_KEYPOINT_HEAD_REGISTRY,
    ROI_MASK_HEAD_REGISTRY,
)
from ..poolers import ROIPooler
from .box_head import FastRCNNConvFCHead, FastRCNNOutputLayers
from .fast_rcnn import fast_rcnn_inference_batched, fast_rcnn_losses, predict_boxes, predict_probs
from .keypoint_head import keypoint_rcnn_inference, keypoint_rcnn_loss
from .mask_head import crop_gt_masks_batched, mask_rcnn_inference, mask_rcnn_loss


def add_ground_truth_to_proposals(proposals: Dict, batch: Dict) -> Dict:
    """Append GT boxes as proposals (reference proposal_utils.py:8-34).

    GT entries get a high objectness logit (the reference uses
    logit(~1) ~ 10); padded GT slots stay invalid.
    """
    gt_boxes = batch["gt_boxes"]
    gt_valid = batch["gt_valid"]
    gt_scores = jnp.where(gt_valid, 10.0, -jnp.inf)
    return {
        "boxes": jnp.concatenate([proposals["boxes"], gt_boxes], axis=1),
        "scores": jnp.concatenate([proposals["scores"], gt_scores], axis=1),
        "valid": jnp.concatenate([proposals["valid"], gt_valid], axis=1),
    }


def _combine_sampled(pos_idx, pos_valid, neg_idx, neg_valid):
    """Merge fixed-size positive/negative samples into one index array."""
    n = pos_idx.shape[0]
    num_pos = jnp.sum(pos_valid)
    slot = jnp.arange(n)
    neg_slot = jnp.clip(slot - num_pos, 0, n - 1)
    idx = jnp.where(slot < num_pos, pos_idx, neg_idx[neg_slot])
    valid = slot < (num_pos + jnp.sum(neg_valid))
    is_pos = slot < num_pos
    return idx, valid, is_pos


class ROIHeads:
    """Base: shared config + proposal labeling/sampling."""

    def __init__(self, cfg, input_shapes: Dict[str, ShapeSpec]):
        self.cfg = cfg
        self.batch_size_per_image = cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE
        self.positive_fraction = cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION
        self.num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
        self.proposal_append_gt = cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT
        self.score_thresh = cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST
        self.nms_thresh = cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST
        self.detections_per_image = cfg.TEST.DETECTIONS_PER_IMAGE
        self.in_features = list(cfg.MODEL.ROI_HEADS.IN_FEATURES)
        self.input_shapes = input_shapes
        self.mask_on = cfg.MODEL.MASK_ON
        self.keypoint_on = cfg.MODEL.KEYPOINT_ON
        self.max_fg = max(int(self.batch_size_per_image * self.positive_fraction), 1)
        self.dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32

        self.box_dim = 4
        self.proposal_matcher = Matcher(
            cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS,
            cfg.MODEL.ROI_HEADS.IOU_LABELS,
            allow_low_quality_matches=False,
        )

    def _pairwise_iou(self, gt_boxes, boxes):
        return pairwise_iou(gt_boxes, boxes)

    def label_and_sample_proposals(self, proposals: Dict, batch: Dict, rng) -> Dict:
        """Vmapped equivalent of reference roi_heads.py:196-280.

        Returns per-image fixed-size sample:
            boxes (B, S, 4), gt_classes (B, S) in [0, K] (K = bg),
            gt_idx (B, S) matched gt row, valid (B, S), is_fg (B, S).
        """
        if self.proposal_append_gt:
            proposals = add_ground_truth_to_proposals(proposals, batch)

        def per_image(boxes, box_valid, gt_boxes, gt_classes, gt_valid, rng_i):
            quality = self._pairwise_iou(gt_boxes, boxes)  # (G, P)
            # padded proposals must not match anything
            quality = jnp.where(box_valid[None, :], quality, -1.0)
            matched_idxs, matched_labels = self.proposal_matcher(quality, gt_valid)
            classes = gt_classes[matched_idxs]
            classes = jnp.where(matched_labels == 0, self.num_classes, classes)
            classes = jnp.where(matched_labels == -1, -1, classes)
            classes = jnp.where(box_valid, classes, -1)  # padding -> ignore

            pos_idx, pos_valid, neg_idx, neg_valid = subsample_labels(
                classes, self.batch_size_per_image, self.positive_fraction, self.num_classes, rng_i
            )
            idx, valid, is_fg = _combine_sampled(pos_idx, pos_valid, neg_idx, neg_valid)
            return {
                "boxes": boxes[idx],
                "gt_classes": jnp.where(valid, classes[idx], self.num_classes),
                "gt_idx": matched_idxs[idx],
                "valid": valid,
                "is_fg": is_fg & valid,
            }

        b = batch["gt_boxes"].shape[0]
        rngs = jax.random.split(rng, b)
        return jax.vmap(per_image)(
            proposals["boxes"],
            proposals["valid"],
            batch["gt_boxes"],
            batch["gt_classes"],
            batch["gt_valid"],
            rngs,
        )


def _select_fg(sampled: Dict, max_fg: int) -> Tuple[Dict, jnp.ndarray]:
    """Gather a fixed-size foreground subset per image (for mask/kp branches)."""

    def per_image(tree):
        score = tree["is_fg"].astype(jnp.float32) - jnp.arange(tree["is_fg"].shape[0]) * 1e-6
        _, idx = jax.lax.top_k(score, max_fg)
        sub = {k: v[idx] for k, v in tree.items()}
        sub["valid"] = sub["is_fg"]
        return sub

    return jax.vmap(per_image)(sampled)


@ROI_HEADS_REGISTRY.register()
class StandardROIHeads(ROIHeads):
    """FPN-style heads: separate pooled box/mask/keypoint branches
    (reference roi_heads.py:457-719)."""

    def __init__(self, cfg, input_shapes: Dict[str, ShapeSpec]):
        super().__init__(cfg, input_shapes)
        shapes = [input_shapes[f] for f in self.in_features]
        scales = [1.0 / s.stride for s in shapes]
        in_channels = shapes[0].channels

        rb = cfg.MODEL.ROI_BOX_HEAD
        self.box_pooler = ROIPooler(rb.POOLER_RESOLUTION, scales, rb.POOLER_SAMPLING_RATIO, rb.POOLER_TYPE)
        self.box_head_module = ROI_BOX_HEAD_REGISTRY.get(rb.NAME or "FastRCNNConvFCHead")(
            num_conv=rb.NUM_CONV, conv_dim=rb.CONV_DIM, num_fc=rb.NUM_FC, fc_dim=rb.FC_DIM,
            norm=rb.NORM, dtype=self.dtype,
        )
        self.box_predictor_module = FastRCNNOutputLayers(
            num_classes=self.num_classes,
            cls_agnostic_bbox_reg=rb.CLS_AGNOSTIC_BBOX_REG,
            dtype=self.dtype,
        )
        self.box2box_transform = Box2BoxTransform(weights=rb.BBOX_REG_WEIGHTS)
        self.smooth_l1_beta = rb.SMOOTH_L1_BETA
        self.box_pooled_shape = (rb.POOLER_RESOLUTION, rb.POOLER_RESOLUTION, in_channels)
        # the fork routes RETINANET focal-loss params into the ROI outputs
        # (reference roi_heads.py:146-147, 626-634)
        self.focal_gamma = cfg.MODEL.RETINANET.FOCAL_LOSS_GAMMA
        self.focal_alpha = cfg.MODEL.RETINANET.FOCAL_LOSS_ALPHA
        self.use_focal_cls = False  # flipped by FasterRCNNFocalLoss meta-arch

        if self.mask_on:
            rm = cfg.MODEL.ROI_MASK_HEAD
            self.mask_pooler = ROIPooler(rm.POOLER_RESOLUTION, scales, rm.POOLER_SAMPLING_RATIO, rm.POOLER_TYPE)
            self.mask_head_module = ROI_MASK_HEAD_REGISTRY.get(rm.NAME)(
                num_conv=rm.NUM_CONV, conv_dim=rm.CONV_DIM, num_classes=self.num_classes,
                cls_agnostic=rm.CLS_AGNOSTIC_MASK, norm=rm.NORM, dtype=self.dtype,
            )
            self.mask_pooled_shape = (rm.POOLER_RESOLUTION, rm.POOLER_RESOLUTION, in_channels)
            self.mask_gt_stride = cfg.TPU.GT_MASK_STRIDE

        if self.keypoint_on:
            rk = cfg.MODEL.ROI_KEYPOINT_HEAD
            self.keypoint_pooler = ROIPooler(rk.POOLER_RESOLUTION, scales, rk.POOLER_SAMPLING_RATIO, rk.POOLER_TYPE)
            self.keypoint_head_module = ROI_KEYPOINT_HEAD_REGISTRY.get(rk.NAME)(
                conv_dims=tuple(rk.CONV_DIMS), num_keypoints=rk.NUM_KEYPOINTS, dtype=self.dtype,
            )
            self.keypoint_pooled_shape = (rk.POOLER_RESOLUTION, rk.POOLER_RESOLUTION, in_channels)
            self.normalize_kp_by_visible = rk.NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS
            self.keypoint_loss_weight = rk.LOSS_WEIGHT

    # -- params -------------------------------------------------------------
    def init_params(self, rng) -> Dict:
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        ph, pw, c = self.box_pooled_shape
        dummy = jnp.zeros((1, ph, pw, c), jnp.float32)
        box_feat = self.box_head_module.init(r1, dummy)["params"]
        feat_out = self.box_head_module.apply({"params": box_feat}, dummy)
        params = {
            "box_head": box_feat,
            "box_predictor": self.box_predictor_module.init(r2, feat_out)["params"],
        }
        if self.mask_on:
            mh, mw, mc = self.mask_pooled_shape
            params["mask_head"] = self.mask_head_module.init(r3, jnp.zeros((1, mh, mw, mc)))["params"]
        if self.keypoint_on:
            kh, kw, kc = self.keypoint_pooled_shape
            params["keypoint_head"] = self.keypoint_head_module.init(r4, jnp.zeros((1, kh, kw, kc)))["params"]
        return params

    def _box_forward(self, params, feats: List[jnp.ndarray], boxes: jnp.ndarray):
        pooled = self.box_pooler(feats, boxes)  # (B, S, PH, PW, C)
        b, s = pooled.shape[:2]
        flat = pooled.reshape(b * s, *pooled.shape[2:])
        feat = self.box_head_module.apply({"params": params["box_head"]}, flat)
        logits, deltas = self.box_predictor_module.apply({"params": params["box_predictor"]}, feat)
        return logits, deltas  # (B*S, K+1), (B*S, K*4)

    # -- training ------------------------------------------------------------
    def forward_train(self, params, features: Dict, proposals: Dict, batch: Dict, rng):
        feats = [features[f] for f in self.in_features]
        sampled = self.label_and_sample_proposals(proposals, batch, rng)
        sampled = jax.tree.map(jax.lax.stop_gradient, sampled)

        logits, deltas = self._box_forward(params, feats, sampled["boxes"])
        b, s = sampled["boxes"].shape[:2]
        # one-hot contraction, not take_along_axis: per-row gathers of
        # 16-byte rows run ~1us/row on TPU (same fix as the RPN one-hot GT)
        onehot = jax.nn.one_hot(
            sampled["gt_idx"], batch["gt_boxes"].shape[1], dtype=batch["gt_boxes"].dtype
        )  # (B, S, G)
        gt_boxes_matched = jnp.einsum("bsg,bgd->bsd", onehot, batch["gt_boxes"])
        losses = fast_rcnn_losses(
            self.box2box_transform,
            logits,
            deltas,
            sampled["boxes"].reshape(b * s, self.box_dim),
            gt_boxes_matched.reshape(b * s, self.box_dim),
            sampled["gt_classes"].reshape(b * s),
            sampled["valid"].reshape(b * s),
            self.smooth_l1_beta,
            use_focal=self.use_focal_cls,
            focal_alpha=self.focal_alpha,
            focal_gamma=self.focal_gamma,
        )

        if self.mask_on or self.keypoint_on:
            fg = _select_fg(sampled, self.max_fg)
            fb, fs = fg["boxes"].shape[:2]
            if self.mask_on:
                pooled = self.mask_pooler(feats, fg["boxes"])
                flat = pooled.reshape(fb * fs, *pooled.shape[2:])
                mask_logits = self.mask_head_module.apply({"params": params["mask_head"]}, flat)
                crops = crop_gt_masks_batched(
                    batch["gt_masks"], fg["gt_idx"], fg["boxes"],
                    self.mask_gt_stride, mask_logits.shape[1],
                )
                losses["loss_mask"] = mask_rcnn_loss(
                    mask_logits,
                    fg["gt_classes"].reshape(fb * fs),
                    crops.reshape(fb * fs, *crops.shape[2:]),
                    fg["valid"].reshape(fb * fs),
                )
            if self.keypoint_on:
                pooled = self.keypoint_pooler(feats, fg["boxes"])
                flat = pooled.reshape(fb * fs, *pooled.shape[2:])
                kp_logits = self.keypoint_head_module.apply({"params": params["keypoint_head"]}, flat)
                gt_kpts = jnp.take_along_axis(
                    batch["gt_keypoints"], fg["gt_idx"][..., None, None], axis=1
                )  # (B, FS, K, 3)
                normalizer = (
                    None
                    if self.normalize_kp_by_visible
                    else fb * self.batch_size_per_image * self.positive_fraction * kp_logits.shape[-1]
                )
                losses["loss_keypoint"] = self.keypoint_loss_weight * keypoint_rcnn_loss(
                    kp_logits,
                    gt_kpts.reshape(fb * fs, *gt_kpts.shape[2:]),
                    fg["boxes"].reshape(fb * fs, 4),
                    fg["valid"].reshape(fb * fs),
                    normalizer=normalizer,
                )
        return losses

    # -- inference -----------------------------------------------------------
    def forward_inference(self, params, features: Dict, proposals: Dict, batch: Dict):
        feats = [features[f] for f in self.in_features]
        boxes_in = proposals["boxes"]
        b, p = boxes_in.shape[:2]
        logits, deltas = self._box_forward(params, feats, boxes_in)
        probs = predict_probs(logits).reshape(b, p, -1)
        decoded = predict_boxes(
            self.box2box_transform, deltas, boxes_in.reshape(b * p, self.box_dim)
        ).reshape(b, p, -1, 4)
        dets = fast_rcnn_inference_batched(
            decoded,
            probs,
            batch["image_size"],
            proposals["valid"],
            self.score_thresh,
            self.nms_thresh,
            self.detections_per_image,
        )

        if self.mask_on:
            pooled = self.mask_pooler(feats, dets["boxes"])
            d = dets["boxes"].shape[1]
            flat = pooled.reshape(b * d, *pooled.shape[2:])
            mask_logits = self.mask_head_module.apply({"params": params["mask_head"]}, flat)
            dets["masks"] = mask_rcnn_inference(
                mask_logits, dets["classes"].reshape(b * d)
            ).reshape(b, d, *mask_logits.shape[1:3])
        if self.keypoint_on:
            pooled = self.keypoint_pooler(feats, dets["boxes"])
            d = dets["boxes"].shape[1]
            flat = pooled.reshape(b * d, *pooled.shape[2:])
            kp_logits = self.keypoint_head_module.apply({"params": params["keypoint_head"]}, flat)
            dets["keypoints"] = keypoint_rcnn_inference(
                kp_logits, dets["boxes"].reshape(b * d, 4)
            ).reshape(b, d, -1, 4)
        return dets
