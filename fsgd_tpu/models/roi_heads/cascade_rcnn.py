"""Cascade R-CNN heads.

Parity with detectron2/modeling/roi_heads/cascade_rcnn.py:18-243
(``CascadeROIHeads``): three refinement stages with increasing IoU matchers
(0.5/0.6/0.7) and tighter box2box weights, class-agnostic per-stage
regression, ``_ScaleGradient`` (1/num_stages on shared features), re-matching
(without re-sampling) between stages, and inference that averages class
scores over stages on the final stage's boxes.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ...ops.box_transform import Box2BoxTransform
from ...ops.matcher import Matcher
from ...structures import pairwise_iou
from ..build import ROI_BOX_HEAD_REGISTRY, ROI_HEADS_REGISTRY
from .box_head import FastRCNNOutputLayers
from .fast_rcnn import fast_rcnn_inference_batched, fast_rcnn_losses, predict_boxes, predict_probs
from .roi_heads import StandardROIHeads


@jax.custom_vjp
def _scale_gradient(x, scale):
    return x


def _scale_gradient_fwd(x, scale):
    return x, scale


def _scale_gradient_bwd(scale, g):
    return (g * scale, None)


_scale_gradient.defvjp(_scale_gradient_fwd, _scale_gradient_bwd)


@ROI_HEADS_REGISTRY.register()
class CascadeROIHeads(StandardROIHeads):
    def __init__(self, cfg, input_shapes):
        super().__init__(cfg, input_shapes)
        cascade_bbox_reg_weights = cfg.MODEL.ROI_BOX_CASCADE_HEAD.BBOX_REG_WEIGHTS
        cascade_ious = cfg.MODEL.ROI_BOX_CASCADE_HEAD.IOUS
        assert len(cascade_bbox_reg_weights) == len(cascade_ious)
        assert cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG, (
            "CascadeROIHeads only supports class-agnostic regression!"
        )
        assert cascade_ious[0] == cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS[0]
        self.num_cascade_stages = len(cascade_ious)

        rb = cfg.MODEL.ROI_BOX_HEAD
        self.cascade_box_heads = [
            ROI_BOX_HEAD_REGISTRY.get(rb.NAME or "FastRCNNConvFCHead")(
                num_conv=rb.NUM_CONV, conv_dim=rb.CONV_DIM, num_fc=rb.NUM_FC, fc_dim=rb.FC_DIM,
                norm=rb.NORM, dtype=self.dtype,
            )
            for _ in range(self.num_cascade_stages)
        ]
        self.cascade_predictors = [
            FastRCNNOutputLayers(
                num_classes=self.num_classes, cls_agnostic_bbox_reg=True, dtype=self.dtype
            )
            for _ in range(self.num_cascade_stages)
        ]
        self.cascade_transforms = [Box2BoxTransform(weights=w) for w in cascade_bbox_reg_weights]
        self.cascade_matchers = [
            Matcher([iou], [0, 1], allow_low_quality_matches=False) for iou in cascade_ious
        ]

    def init_params(self, rng) -> Dict:
        rngs = jax.random.split(rng, 2 * self.num_cascade_stages + 1)
        ph, pw, c = self.box_pooled_shape
        dummy = jnp.zeros((1, ph, pw, c), jnp.float32)
        params = {}
        for k in range(self.num_cascade_stages):
            head_params = self.cascade_box_heads[k].init(rngs[2 * k], dummy)["params"]
            feat = self.cascade_box_heads[k].apply({"params": head_params}, dummy)
            params["box_head_{}".format(k)] = head_params
            params["box_predictor_{}".format(k)] = self.cascade_predictors[k].init(
                rngs[2 * k + 1], feat
            )["params"]
        if self.mask_on:
            mh, mw, mc = self.mask_pooled_shape
            params["mask_head"] = self.mask_head_module.init(rngs[-1], jnp.zeros((1, mh, mw, mc)))["params"]
        return params

    def _run_stage(self, params, feats, boxes, stage: int):
        pooled = self.box_pooler(feats, boxes)
        b, s = pooled.shape[:2]
        flat = pooled.reshape(b * s, *pooled.shape[2:])
        flat = _scale_gradient(flat, 1.0 / self.num_cascade_stages)
        feat = self.cascade_box_heads[stage].apply({"params": params["box_head_{}".format(stage)]}, flat)
        logits, deltas = self.cascade_predictors[stage].apply(
            {"params": params["box_predictor_{}".format(stage)]}, feat
        )
        return logits, deltas  # (B*S, K+1), (B*S, 4)

    @staticmethod
    def _clip_to_image(boxes, image_size):
        """Clip (B, S, 4) xyxy boxes to per-image (h, w) — the reference
        clips refined boxes between stages (_create_proposals_from_boxes,
        cascade_rcnn.py:222-243); skipping this shifts the next stage's
        pooling for any box whose deltas push it outside the image."""
        h = image_size[:, 0:1].astype(boxes.dtype)
        w = image_size[:, 1:2].astype(boxes.dtype)
        return jnp.stack(
            [
                jnp.clip(boxes[..., 0], 0.0, w),
                jnp.clip(boxes[..., 1], 0.0, h),
                jnp.clip(boxes[..., 2], 0.0, w),
                jnp.clip(boxes[..., 3], 0.0, h),
            ],
            axis=-1,
        )

    def _rematch(self, boxes, box_valid, batch, stage: int):
        """Assign labels to refined boxes with the stage's matcher (no sampling)."""

        def per_image(bx, bv, gt_boxes, gt_classes, gt_valid):
            quality = pairwise_iou(gt_boxes, bx)
            quality = jnp.where(bv[None, :], quality, -1.0)
            matched_idxs, matched_labels = self.cascade_matchers[stage](quality, gt_valid)
            classes = gt_classes[matched_idxs]
            classes = jnp.where(matched_labels == 0, self.num_classes, classes)
            classes = jnp.where(bv, classes, self.num_classes)
            return classes.astype(jnp.int32), matched_idxs

        return jax.vmap(per_image)(
            boxes, box_valid, batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"]
        )

    def forward_train(self, params, features: Dict, proposals: Dict, batch: Dict, rng):
        feats = [features[f] for f in self.in_features]
        sampled = self.label_and_sample_proposals(proposals, batch, rng)
        sampled = jax.tree.map(jax.lax.stop_gradient, sampled)

        boxes = sampled["boxes"]
        valid = sampled["valid"]
        gt_classes = sampled["gt_classes"]
        gt_idx = sampled["gt_idx"]
        b, s = boxes.shape[:2]

        losses = {}
        for stage in range(self.num_cascade_stages):
            logits, deltas = self._run_stage(params, feats, boxes, stage)
            # one-hot contraction, not take_along_axis (see StandardROIHeads)
            onehot = jax.nn.one_hot(
                gt_idx, batch["gt_boxes"].shape[1], dtype=batch["gt_boxes"].dtype
            )
            gt_boxes_matched = jnp.einsum("bsg,bgd->bsd", onehot, batch["gt_boxes"])
            transform = self.cascade_transforms[stage]
            stage_losses = fast_rcnn_losses(
                transform,
                logits,
                deltas,
                boxes.reshape(b * s, 4),
                gt_boxes_matched.reshape(b * s, 4),
                gt_classes.reshape(b * s),
                valid.reshape(b * s),
                self.smooth_l1_beta,
            )
            losses.update({k + "_stage{}".format(stage): v for k, v in stage_losses.items()})

            if stage < self.num_cascade_stages - 1:
                refined = transform.apply_deltas(deltas, boxes.reshape(b * s, 4)).reshape(b, s, 4)
                refined = self._clip_to_image(refined, batch["image_size"])
                # reference drops empty boxes from later stages (training only)
                nonempty = (refined[..., 2] > refined[..., 0]) & (
                    refined[..., 3] > refined[..., 1]
                )
                valid = valid & nonempty
                boxes = jax.lax.stop_gradient(refined)
                gt_classes, gt_idx = self._rematch(boxes, valid, batch, stage + 1)
                gt_classes = jax.lax.stop_gradient(gt_classes)
                gt_idx = jax.lax.stop_gradient(gt_idx)

        if self.mask_on:
            # mask branch on the stage-0 sampled foreground (as in the reference)
            from .roi_heads import _select_fg
            from .mask_head import crop_gt_masks_batched, mask_rcnn_loss

            fg = _select_fg(sampled, self.max_fg)
            fb, fs = fg["boxes"].shape[:2]
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
        return losses

    def forward_inference(self, params, features: Dict, proposals: Dict, batch: Dict):
        feats = [features[f] for f in self.in_features]
        boxes = proposals["boxes"]
        b, p = boxes.shape[:2]

        all_probs = []
        for stage in range(self.num_cascade_stages):
            logits, deltas = self._run_stage(params, feats, boxes, stage)
            all_probs.append(predict_probs(logits).reshape(b, p, -1))
            if stage < self.num_cascade_stages - 1:
                boxes = self.cascade_transforms[stage].apply_deltas(
                    deltas, boxes.reshape(b * p, 4)
                ).reshape(b, p, 4)
                boxes = self._clip_to_image(boxes, batch["image_size"])

        probs = sum(all_probs) / self.num_cascade_stages
        decoded = predict_boxes(
            self.cascade_transforms[-1], deltas, boxes.reshape(b * p, 4)
        ).reshape(b, p, -1, 4)
        dets = fast_rcnn_inference_batched(
            decoded, probs, batch["image_size"], proposals["valid"],
            self.score_thresh, self.nms_thresh, self.detections_per_image,
        )
        if self.mask_on:
            from .mask_head import mask_rcnn_inference

            d = dets["boxes"].shape[1]
            pooled = self.mask_pooler(feats, dets["boxes"])
            flat = pooled.reshape(b * d, *pooled.shape[2:])
            mask_logits = self.mask_head_module.apply({"params": params["mask_head"]}, flat)
            dets["masks"] = mask_rcnn_inference(
                mask_logits, dets["classes"].reshape(b * d)
            ).reshape(b, d, *mask_logits.shape[1:3])
        return dets
