"""TensorMask — dense sliding-window instance segmentation.

Parity target: projects/TensorMask/tensormask/arch.py:283-744+ (the
``TensorMask`` meta-arch, its anchor generator and head) with the
SwapAlign2Nat op from fsgd_tpu/ops/swap_align2nat.py.

Round-1 scope: the base-pyramid model — RetinaNet-style cls/box subnets plus
a per-location U x U window-mask subnet in the *aligned* representation,
converted to natural with ``swap_align2nat`` (ALIGNED_ON), per-fg-anchor mask
BCE against GT crops, and inference that attaches each detection's window
mask.  The bipyramid refinement (per-scale mask upsampling towers) is staged
for a later round (BIPYRAMID_ON asserts off).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fsgd_tpu.models.batching import batched_inputs_to_batch  # noqa: F401
from fsgd_tpu.models.build import META_ARCH_REGISTRY, build_anchor_generator, build_backbone
from fsgd_tpu.models.meta_arch.detector_base import DetectorBase
from fsgd_tpu.models.meta_arch.retinanet import RetinaNetHead, cat_levels_N_sumHWA_K, permute_to_N_HWA_K
from fsgd_tpu.ops.box_transform import Box2BoxTransform
from fsgd_tpu.ops.losses import sigmoid_cross_entropy, sigmoid_focal_loss, smooth_l1_loss
from fsgd_tpu.ops.matcher import Matcher
from fsgd_tpu.ops.nms import batched_nms_mask
from fsgd_tpu.ops.roi_align import roi_align
from fsgd_tpu.ops.swap_align2nat import swap_align2nat
from fsgd_tpu.structures import Boxes, pairwise_iou


class TensorMaskModule(nn.Module):
    backbone: Any
    in_features: Sequence[str]
    num_classes: int
    num_anchors: int
    num_convs: int
    prior_prob: float
    channels: int
    mask_size: int
    aligned_on: bool
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        feats_dict = self.backbone(images.astype(self.dtype))
        feats = [feats_dict[f] for f in self.in_features]
        head = RetinaNetHead(
            num_classes=self.num_classes,
            num_anchors=self.num_anchors,
            num_convs=self.num_convs,
            prior_prob=self.prior_prob,
            channels=self.channels,
            dtype=self.dtype,
            name="head",
        )
        box_cls, box_delta = head(feats)

        # mask subnet: shared conv tower + U*U mask logits per location
        conv_kw = dict(
            kernel_size=(3, 3), padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype, param_dtype=jnp.float32,
        )
        tower = [nn.Conv(self.channels, name="mask_tower{}".format(i), **conv_kw) for i in range(self.num_convs)]
        mask_pred = nn.Conv(self.num_anchors * self.mask_size * self.mask_size,
                            name="mask_pred", **conv_kw)
        masks = []
        for f in feats:
            m = f
            for conv in tower:
                m = nn.relu(conv(m))
            m = mask_pred(m).astype(jnp.float32)
            if self.aligned_on:
                # each anchor's U*U block goes through swap_align2nat
                b, h, w, _ = m.shape
                u2 = self.mask_size * self.mask_size
                m = m.reshape(b, h, w, self.num_anchors, u2)
                m = jnp.concatenate(
                    [swap_align2nat(m[..., a, :], lambda_val=1.0) for a in range(self.num_anchors)],
                    axis=-1,
                ).reshape(b, h, w, self.num_anchors * u2)
            masks.append(m)
        return box_cls, box_delta, masks


@META_ARCH_REGISTRY.register()
class TensorMask(DetectorBase):
    def __init__(self, cfg):
        super().__init__(cfg)
        tm = cfg.MODEL.TENSOR_MASK
        assert not tm.BIPYRAMID_ON, "bipyramid refinement is staged for a later round"
        self.num_classes = tm.NUM_CLASSES
        self.in_features = list(tm.IN_FEATURES)
        self.mask_size = tm.MASK_SIZE
        self.mask_loss_weight = tm.MASK_LOSS_WEIGHT
        self.focal_loss_alpha = tm.FOCAL_LOSS_ALPHA
        self.focal_loss_gamma = tm.FOCAL_LOSS_GAMMA
        self.score_threshold = tm.SCORE_THRESH_TEST
        self.topk_candidates = tm.TOPK_CANDIDATES_TEST
        self.nms_threshold = tm.NMS_THRESH_TEST
        self.max_detections_per_image = cfg.TEST.DETECTIONS_PER_IMAGE

        backbone = build_backbone(cfg)
        shapes = backbone.output_shape()
        feature_shapes = [shapes[f] for f in self.in_features]
        self.feature_strides = [s.stride for s in feature_shapes]
        self.anchor_generator = build_anchor_generator(cfg, feature_shapes)
        num_cell = self.anchor_generator.num_cell_anchors
        assert len(set(num_cell)) == 1
        self.num_anchors = num_cell[0]

        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        self.module = TensorMaskModule(
            backbone=backbone,
            in_features=self.in_features,
            num_classes=self.num_classes,
            num_anchors=self.num_anchors,
            num_convs=tm.NUM_CONVS,
            prior_prob=tm.PRIOR_PROB,
            channels=cfg.MODEL.FPN.OUT_CHANNELS,
            mask_size=self.mask_size,
            aligned_on=tm.ALIGNED_ON,
            dtype=dtype,
        )
        self.box2box_transform = Box2BoxTransform(weights=tm.BBOX_REG_WEIGHTS)
        self.matcher = Matcher(tm.IOU_THRESHOLDS, tm.IOU_LABELS, allow_low_quality_matches=True)
        self.mask_gt_stride = cfg.TPU.GT_MASK_STRIDE

    def anchors_for(self, h: int, w: int):
        import math

        grids = [(int(math.ceil(h / s)), int(math.ceil(w / s))) for s in self.feature_strides]
        return self.anchor_generator(grids)

    def get_ground_truth(self, anchors_cat, batch):
        def per_image(gt_boxes, gt_classes_in, gt_valid):
            quality = pairwise_iou(gt_boxes, anchors_cat)
            matched_idxs, anchor_labels = self.matcher(quality, gt_valid)
            deltas = self.box2box_transform.get_deltas(anchors_cat, gt_boxes[matched_idxs])
            classes = gt_classes_in[matched_idxs]
            classes = jnp.where(anchor_labels == 0, self.num_classes, classes)
            classes = jnp.where(anchor_labels == -1, -1, classes)
            return classes.astype(jnp.int32), deltas, matched_idxs

        return jax.vmap(per_image)(batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"])

    def loss_fn(self, params, batch, rng=None):
        images = self.normalize(batch["image"])
        box_cls, box_delta, mask_logits_levels = self.module.apply({"params": params}, images)
        h, w = batch["image"].shape[1:3]
        anchors = self.anchors_for(h, w)
        anchors_cat = jnp.concatenate([a.tensor for a in anchors], axis=0)

        logits = cat_levels_N_sumHWA_K(box_cls, self.num_classes)
        deltas = cat_levels_N_sumHWA_K(box_delta, 4)
        u2 = self.mask_size * self.mask_size
        mask_logits = cat_levels_N_sumHWA_K(mask_logits_levels, u2)  # (B, R, U*U)

        gt_classes, gt_deltas, matched_idxs = self.get_ground_truth(anchors_cat, batch)
        gt_classes = jax.lax.stop_gradient(gt_classes)
        gt_deltas = jax.lax.stop_gradient(gt_deltas)

        k = self.num_classes
        b, r = gt_classes.shape
        flat_cls = logits.reshape(-1, k)
        flat_gt = gt_classes.reshape(-1)
        valid = flat_gt >= 0
        fg = valid & (flat_gt != k)
        num_fg = jnp.maximum(jnp.sum(fg), 1)
        target = jax.nn.one_hot(jnp.where(fg, flat_gt, k), k, dtype=flat_cls.dtype)
        cls_el = sigmoid_focal_loss(flat_cls, target, self.focal_loss_alpha, self.focal_loss_gamma)
        loss_cls = jnp.sum(jnp.where(valid[:, None], cls_el, 0.0)) / num_fg
        reg_el = smooth_l1_loss(deltas.reshape(-1, 4), gt_deltas.reshape(-1, 4), beta=0.0)
        loss_box_reg = jnp.sum(jnp.where(fg[:, None], reg_el, 0.0)) / num_fg

        # mask loss on a fixed top-MAX_FG subset of foreground anchors:
        # window mask logits vs GT bitmask crops at the anchor box
        max_fg = 128
        fg_b = fg.reshape(b, r)

        def per_image_mask(fg_i, midx_i, masks_i, gt_masks_i):
            score = fg_i.astype(jnp.float32) - jnp.arange(r) * 1e-9
            _, sel = jax.lax.top_k(score, max_fg)
            sel_valid = fg_i[sel]
            sel_anchor_boxes = anchors_cat[sel]
            sel_gt = gt_masks_i[midx_i[sel]]  # (max_fg, MH, MW)
            crops = _crop_masks(sel_gt, sel_anchor_boxes, self.mask_gt_stride, self.mask_size)
            sel_logits = masks_i[sel].reshape(max_fg, self.mask_size, self.mask_size)
            el = sigmoid_cross_entropy(sel_logits, (crops >= 0.5).astype(jnp.float32))
            return jnp.sum(jnp.where(sel_valid[:, None, None], el, 0.0)), jnp.sum(sel_valid)

        if "gt_masks" in batch:
            sums, counts = jax.vmap(per_image_mask)(
                fg_b, matched_idxs, mask_logits, batch["gt_masks"]
            )
            loss_mask = jnp.sum(sums) / jnp.maximum(jnp.sum(counts) * u2, 1)
            losses = {
                "loss_cls": loss_cls,
                "loss_box_reg": loss_box_reg,
                "loss_mask": loss_mask * self.mask_loss_weight,
            }
        else:
            losses = {"loss_cls": loss_cls, "loss_box_reg": loss_box_reg}
        return sum(losses.values()), losses

    def inference_fn(self, params, batch):
        images = self.normalize(batch["image"])
        box_cls, box_delta, mask_logits_levels = self.module.apply({"params": params}, images)
        h, w = batch["image"].shape[1:3]
        anchors = self.anchors_for(h, w)
        anchor_tensors = [a.tensor for a in anchors]
        u2 = self.mask_size * self.mask_size

        cls_l = [permute_to_N_HWA_K(t, self.num_classes) for t in box_cls]
        reg_l = [permute_to_N_HWA_K(t, 4) for t in box_delta]
        mask_l = [permute_to_N_HWA_K(t, u2) for t in mask_logits_levels]

        def single_image(cls_levels, reg_levels, mask_levels):
            boxes_all, scores_all, classes_all, masks_all, valid_all = [], [], [], [], []
            for cls_i, reg_i, msk_i, anchors_i in zip(cls_levels, reg_levels, mask_levels, anchor_tensors):
                scores = jax.nn.sigmoid(cls_i).reshape(-1)
                kk = min(1000, scores.shape[0])
                top_scores, top_idx = jax.lax.top_k(scores, kk)
                keep = top_scores > self.score_threshold
                anchor_idx = top_idx // self.num_classes
                class_idx = top_idx % self.num_classes
                pred_boxes = self.box2box_transform.apply_deltas(reg_i[anchor_idx], anchors_i[anchor_idx])
                boxes_all.append(pred_boxes)
                scores_all.append(top_scores)
                classes_all.append(class_idx)
                masks_all.append(jax.nn.sigmoid(msk_i[anchor_idx]).reshape(kk, self.mask_size, self.mask_size))
                valid_all.append(keep)
            boxes = jnp.concatenate(boxes_all, 0)
            scores = jnp.concatenate(scores_all, 0)
            classes = jnp.concatenate(classes_all, 0)
            masks = jnp.concatenate(masks_all, 0)
            valid = jnp.concatenate(valid_all, 0)
            keep = batched_nms_mask(boxes, scores, classes, self.nms_threshold, valid)
            kept = jnp.where(keep, scores, -jnp.inf)
            d = min(self.max_detections_per_image, kept.shape[0])
            top_scores, idx = jax.lax.top_k(kept, d)
            det_valid = top_scores > -jnp.inf
            return {
                "boxes": boxes[idx],
                "scores": jnp.where(det_valid, top_scores, 0.0),
                "classes": classes[idx],
                "masks": masks[idx],
                "valid": det_valid,
            }

        dets = jax.vmap(single_image)(cls_l, reg_l, mask_l)
        from fsgd_tpu.models.postprocessing import scale_detections

        return scale_detections(dets, batch["image_size"], batch["out_size"])


def _crop_masks(gt_masks, boxes, stride, out_size):
    n = boxes.shape[0]
    rois = jnp.concatenate([jnp.arange(n, dtype=boxes.dtype)[:, None], boxes], axis=1)
    feats = gt_masks[..., None].astype(jnp.float32)
    out = roi_align(feats, rois, (out_size, out_size), 1.0 / stride, 2, True)
    return out[..., 0]
