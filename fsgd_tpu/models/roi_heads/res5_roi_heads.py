"""Res5ROIHeads — the C4 head with the shared res5 transform.

Parity with detectron2/modeling/roi_heads/roi_heads.py:313-454: pool res4
features per roi at 14x14, run the res5 stage (stride 2 -> 7x7x2048), average
pool for the box predictor; the mask head (when on) consumes the res5 output.
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...layers import ShapeSpec
from ..backbone.resnet import BottleneckBlock
from ..build import ROI_HEADS_REGISTRY, ROI_MASK_HEAD_REGISTRY
from ..poolers import ROIPooler
from ...ops.box_transform import Box2BoxTransform
from .box_head import FastRCNNOutputLayers
from .fast_rcnn import fast_rcnn_inference_batched, fast_rcnn_losses, predict_boxes, predict_probs
from .mask_head import crop_gt_masks_batched, mask_rcnn_inference, mask_rcnn_loss
from .roi_heads import ROIHeads, _select_fg


class Res5Stage(nn.Module):
    """The res5 stage as used inside the C4 head (reference roi_heads.py:347-371)."""

    in_channels: int
    num_groups: int
    width_per_group: int
    stride_in_1x1: bool
    norm: str
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out_channels = self.in_channels * 2  # 2048 for R-50
        bottleneck = self.width_per_group * self.num_groups * 8  # 512
        in_ch = self.in_channels
        for i in range(3):
            x = BottleneckBlock(
                in_channels=in_ch,
                out_channels=out_channels,
                bottleneck_channels=bottleneck,
                stride=2 if i == 0 else 1,
                num_groups=self.num_groups,
                norm=self.norm,
                stride_in_1x1=self.stride_in_1x1,
                dtype=self.dtype,
                name="res5_block{}".format(i),
            )(x)
            in_ch = out_channels
        return x


@ROI_HEADS_REGISTRY.register()
class Res5ROIHeads(ROIHeads):
    def __init__(self, cfg, input_shapes: Dict[str, ShapeSpec]):
        super().__init__(cfg, input_shapes)
        assert len(self.in_features) == 1, "Res5ROIHeads takes one input feature"
        shape = input_shapes[self.in_features[0]]
        rb = cfg.MODEL.ROI_BOX_HEAD
        self.pooler = ROIPooler(
            rb.POOLER_RESOLUTION, [1.0 / shape.stride], rb.POOLER_SAMPLING_RATIO, rb.POOLER_TYPE
        )
        self.pooled_shape = (rb.POOLER_RESOLUTION, rb.POOLER_RESOLUTION, shape.channels)
        self.res5_module = Res5Stage(
            in_channels=shape.channels,
            num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
            width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
            stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
            norm=cfg.MODEL.RESNETS.NORM,
            dtype=self.dtype,
        )
        self.box_predictor_module = FastRCNNOutputLayers(
            num_classes=self.num_classes,
            cls_agnostic_bbox_reg=rb.CLS_AGNOSTIC_BBOX_REG,
            dtype=self.dtype,
        )
        self.box2box_transform = Box2BoxTransform(weights=rb.BBOX_REG_WEIGHTS)
        self.smooth_l1_beta = rb.SMOOTH_L1_BETA
        self.use_focal_cls = False
        self.focal_gamma = cfg.MODEL.RETINANET.FOCAL_LOSS_GAMMA
        self.focal_alpha = cfg.MODEL.RETINANET.FOCAL_LOSS_ALPHA
        if self.mask_on:
            rm = cfg.MODEL.ROI_MASK_HEAD
            self.mask_head_module = ROI_MASK_HEAD_REGISTRY.get(rm.NAME)(
                num_conv=0, conv_dim=rm.CONV_DIM, num_classes=self.num_classes,
                cls_agnostic=rm.CLS_AGNOSTIC_MASK, norm=rm.NORM, dtype=self.dtype,
            )
            self.mask_gt_stride = cfg.TPU.GT_MASK_STRIDE

    def init_params(self, rng) -> Dict:
        r1, r2, r3 = jax.random.split(rng, 3)
        ph, pw, c = self.pooled_shape
        dummy = jnp.zeros((1, ph, pw, c), jnp.float32)
        res5 = self.res5_module.init(r1, dummy)["params"]
        feat = self.res5_module.apply({"params": res5}, dummy)
        pooled = feat.mean(axis=(1, 2))
        params = {"res5": res5, "box_predictor": self.box_predictor_module.init(r2, pooled)["params"]}
        if self.mask_on:
            params["mask_head"] = self.mask_head_module.init(r3, feat)["params"]
        return params

    def _shared_roi_transform(self, params, feats: List[jnp.ndarray], boxes: jnp.ndarray):
        pooled = self.pooler(feats, boxes)  # (B, S, 14, 14, C)
        b, s = pooled.shape[:2]
        flat = pooled.reshape(b * s, *pooled.shape[2:])
        return self.res5_module.apply({"params": params["res5"]}, flat)  # (B*S, 7, 7, 2C)

    def forward_train(self, params, features: Dict, proposals: Dict, batch: Dict, rng):
        feats = [features[f] for f in self.in_features]
        sampled = self.label_and_sample_proposals(proposals, batch, rng)
        sampled = jax.tree.map(jax.lax.stop_gradient, sampled)
        b, s = sampled["boxes"].shape[:2]

        res5_out = self._shared_roi_transform(params, feats, sampled["boxes"])
        logits, deltas = self.box_predictor_module.apply(
            {"params": params["box_predictor"]}, res5_out.mean(axis=(1, 2))
        )
        # one-hot contraction, not take_along_axis (see StandardROIHeads note)
        onehot = jax.nn.one_hot(
            sampled["gt_idx"], batch["gt_boxes"].shape[1], dtype=batch["gt_boxes"].dtype
        )
        gt_boxes_matched = jnp.einsum("bsg,bgd->bsd", onehot, batch["gt_boxes"])
        losses = fast_rcnn_losses(
            self.box2box_transform,
            logits,
            deltas,
            sampled["boxes"].reshape(b * s, 4),
            gt_boxes_matched.reshape(b * s, 4),
            sampled["gt_classes"].reshape(b * s),
            sampled["valid"].reshape(b * s),
            self.smooth_l1_beta,
            use_focal=self.use_focal_cls,
            focal_alpha=self.focal_alpha,
            focal_gamma=self.focal_gamma,
        )
        if self.mask_on:
            fg = _select_fg(sampled, self.max_fg)
            fb, fs = fg["boxes"].shape[:2]
            fg_feat = self._shared_roi_transform(params, feats, fg["boxes"])
            mask_logits = self.mask_head_module.apply({"params": params["mask_head"]}, fg_feat)
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
        boxes_in = proposals["boxes"]
        b, p = boxes_in.shape[:2]
        res5_out = self._shared_roi_transform(params, feats, boxes_in)
        logits, deltas = self.box_predictor_module.apply(
            {"params": params["box_predictor"]}, res5_out.mean(axis=(1, 2))
        )
        probs = predict_probs(logits).reshape(b, p, -1)
        decoded = predict_boxes(self.box2box_transform, deltas, boxes_in.reshape(b * p, 4)).reshape(b, p, -1, 4)
        dets = fast_rcnn_inference_batched(
            decoded, probs, batch["image_size"], proposals["valid"],
            self.score_thresh, self.nms_thresh, self.detections_per_image,
        )
        if self.mask_on:
            d = dets["boxes"].shape[1]
            det_feat = self._shared_roi_transform(params, feats, dets["boxes"])
            mask_logits = self.mask_head_module.apply({"params": params["mask_head"]}, det_feat)
            dets["masks"] = mask_rcnn_inference(
                mask_logits, dets["classes"].reshape(b * d)
            ).reshape(b, d, *mask_logits.shape[1:3])
        return dets
