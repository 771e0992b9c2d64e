"""RetinaNet — one-stage dense detector (fork-modified variant).

Behavioral parity with the reference's fork-patched
detectron2/modeling/meta_arch/retinanet.py:57-606:

* training forward returns the 5-tuple
  ``(images, {"pred_class_logits", "pred_proposal_deltas"}, gt_classes, mask,
  losses)`` consumed by the gambler (retinanet.py:141-146);
* the picky matcher (IoU [0.4, 0.9], retinanet.py:96-100) yields the binary
  betting mask via ``get_picky_ground_truth`` (retinanet.py:370-429);
* focal ``losses`` (retinanet.py:201-249), plus the extra ``ce_losses`` /
  ``sigmoid_loss`` (weighted BCE/focal, retinanet.py:159-307) used by the
  gambler's detector objective;
* inference: per-level top-k -> score filter -> decode -> class-aware NMS ->
  top ``DETECTIONS_PER_IMAGE`` (retinanet.py:431-520).

TPU design: GT assignment is a vmapped masked matcher over padded GT (no
per-image Python loops); inference is fully batched with static shapes
(masked top-k + the parallel-iteration NMS); the heavy compute (ResNet-FPN +
heads) runs in bfloat16 under one jit.
"""

from __future__ import annotations

import logging

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.box_transform import Box2BoxTransform
from ...ops.losses import sigmoid_focal_loss, smooth_l1_loss
from ...ops.matcher import Matcher
from ...ops.nms import batched_nms_mask
from ...structures import Boxes, Instances, pairwise_iou
from ..anchor_generator import DefaultAnchorGenerator
from ..backbone.fpn import build_retinanet_resnet_fpn_backbone
from ..build import META_ARCH_REGISTRY, build_anchor_generator, build_backbone
from ..postprocessing import scale_detections
from .detector_base import DetectorBase, feature_grid_sizes


def permute_to_N_HWA_K(tensor: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, H, W, A*K) NHWC head output -> (B, H*W*A, K).

    Same element order as the reference's NCHW permute
    (retinanet.py:24-33): y-major, then x, then anchor.
    """
    b, h, w, ak = tensor.shape
    return tensor.reshape(b, h * w * (ak // k), k)


def cat_levels_N_sumHWA_K(tensors: Sequence[jnp.ndarray], k: int) -> jnp.ndarray:
    """List of per-level (B, Hi, Wi, A*K) -> (B, sum HiWiA, K)."""
    return jnp.concatenate([permute_to_N_HWA_K(t, k) for t in tensors], axis=1)


class RetinaNetHead(nn.Module):
    """Shared cls/box towers applied to every FPN level
    (reference retinanet.py:535-606)."""

    num_classes: int
    num_anchors: int
    num_convs: int = 4
    prior_prob: float = 0.01
    channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]):
        conv_kw = dict(
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        cls_tower = [nn.Conv(self.channels, name="cls_tower{}".format(i), **conv_kw) for i in range(self.num_convs)]
        box_tower = [nn.Conv(self.channels, name="box_tower{}".format(i), **conv_kw) for i in range(self.num_convs)]
        # focal-loss prior: bias = -log((1 - p) / p) on the cls logits
        bias_value = -float(np.log((1 - self.prior_prob) / self.prior_prob))
        cls_score = nn.Conv(
            self.num_anchors * self.num_classes,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias_value),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="cls_score",
        )
        bbox_pred = nn.Conv(
            self.num_anchors * 4,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bbox_pred",
        )

        logits, bbox_reg = [], []
        for feat in features:
            c = feat
            for conv in cls_tower:
                c = nn.relu(conv(c))
            logits.append(cls_score(c).astype(jnp.float32))
            b = feat
            for conv in box_tower:
                b = nn.relu(conv(b))
            bbox_reg.append(bbox_pred(b).astype(jnp.float32))
        return logits, bbox_reg


class RetinaNetModule(nn.Module):
    backbone: Any
    in_features: Sequence[str]
    num_classes: int
    num_anchors: int
    num_convs: int
    prior_prob: float
    channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        features = self.backbone(images.astype(self.dtype))
        feats = [features[f] for f in self.in_features]
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
        return box_cls, box_delta

    @property
    def size_divisibility(self):
        return self.backbone.size_divisibility


@META_ARCH_REGISTRY.register()
class RetinaNet(DetectorBase):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.num_classes = cfg.MODEL.RETINANET.NUM_CLASSES
        self.in_features = list(cfg.MODEL.RETINANET.IN_FEATURES)
        self.focal_loss_alpha = cfg.MODEL.RETINANET.FOCAL_LOSS_ALPHA
        self.focal_loss_gamma = cfg.MODEL.RETINANET.FOCAL_LOSS_GAMMA
        self.smooth_l1_loss_beta = cfg.MODEL.RETINANET.SMOOTH_L1_LOSS_BETA
        self.score_threshold = cfg.MODEL.RETINANET.SCORE_THRESH_TEST
        self.topk_candidates = cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST
        self.approx_topk = cfg.TPU.get("APPROX_TOPK", False)
        if self.approx_topk:
            logging.getLogger(__name__).info(
                "RetinaNet decode: TPU.APPROX_TOPK=True — approx_max_k candidate "
                "selection (recall ~0.99); set False for exact reference decode."
            )
        self.nms_threshold = cfg.MODEL.RETINANET.NMS_THRESH_TEST
        self.max_detections_per_image = cfg.TEST.DETECTIONS_PER_IMAGE

        backbone = build_backbone(cfg)
        backbone_shapes = backbone.output_shape()
        feature_shapes = [backbone_shapes[f] for f in self.in_features]
        self.feature_strides = [s.stride for s in feature_shapes]
        self.anchor_generator = build_anchor_generator(cfg, feature_shapes)
        num_cell_anchors = self.anchor_generator.num_cell_anchors
        assert len(set(num_cell_anchors)) == 1, "all levels must share #anchors"
        self.num_anchors = num_cell_anchors[0]

        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        self.module = RetinaNetModule(
            backbone=backbone,
            in_features=self.in_features,
            num_classes=self.num_classes,
            num_anchors=self.num_anchors,
            num_convs=cfg.MODEL.RETINANET.NUM_CONVS,
            prior_prob=cfg.MODEL.RETINANET.PRIOR_PROB,
            channels=cfg.MODEL.FPN.OUT_CHANNELS,
            dtype=dtype,
        )

        self.box2box_transform = Box2BoxTransform(weights=cfg.MODEL.RPN.BBOX_REG_WEIGHTS)
        self.matcher = Matcher(
            cfg.MODEL.RETINANET.IOU_THRESHOLDS,
            cfg.MODEL.RETINANET.IOU_LABELS,
            allow_low_quality_matches=True,
        )
        # fork's picky matcher (retinanet.py:96-100): only IoU >= 0.9 or
        # best-per-GT anchors count as "sure" foreground for the betting mask
        self.picky_matcher = Matcher(
            [0.4, 0.9], cfg.MODEL.RETINANET.IOU_LABELS, allow_low_quality_matches=True
        )

    # -- anchors ------------------------------------------------------------
    def anchors_for(self, h: int, w: int) -> List[Boxes]:
        grids = feature_grid_sizes(h, w, self.feature_strides)
        return self.anchor_generator(grids)

    # -- ground truth (vmapped over the batch) ------------------------------
    def get_ground_truth(self, anchors_cat: jnp.ndarray, batch: Dict[str, jnp.ndarray]):
        """Padded-static analogue of reference retinanet.py:310-368.

        Returns gt_classes (B, R) int32 (K = background, -1 = ignore) and
        gt_anchors_deltas (B, R, 4).
        """

        def per_image(gt_boxes, gt_classes_in, gt_valid):
            # streamed matcher: reductions fused over anchor chunks, no (G, R)
            # IoU matrix in HBM (ops/matcher.py match_streamed)
            matched_idxs, anchor_labels, _ = self.matcher.match_streamed(
                gt_boxes, gt_valid, anchors_cat, pairwise_iou
            )
            # one-hot contraction, not gt_boxes[matched_idxs]: the (R,) gather
            # of 16-byte rows is ~10ms/step on TPU; the matmul is ~1ms (exact
            # for class ids too — small ints are representable in fp32)
            onehot = jax.nn.one_hot(matched_idxs, gt_boxes.shape[0], dtype=gt_boxes.dtype)
            matched_boxes = onehot @ gt_boxes
            deltas = self.box2box_transform.get_deltas(anchors_cat, matched_boxes)
            classes = jnp.rint(onehot @ gt_classes_in.astype(onehot.dtype)).astype(jnp.int32)
            classes = jnp.where(anchor_labels == 0, self.num_classes, classes)
            classes = jnp.where(anchor_labels == -1, -1, classes)
            return classes.astype(jnp.int32), deltas

        return jax.vmap(per_image)(batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"])

    def get_picky_ground_truth(self, anchors_cat: jnp.ndarray, batch: Dict[str, jnp.ndarray]):
        """Binary quality mask (B, R): 1 where the picky matcher says
        foreground (reference retinanet.py:370-429)."""

        def per_image(gt_boxes, gt_valid):
            _, anchor_labels, _ = self.picky_matcher.match_streamed(
                gt_boxes, gt_valid, anchors_cat, pairwise_iou
            )
            return (anchor_labels == 1).astype(jnp.int32)

        return jax.vmap(per_image)(batch["gt_boxes"], batch["gt_valid"])

    # -- losses --------------------------------------------------------------
    def losses(self, gt_classes, gt_anchors_deltas, pred_class_logits, pred_anchor_deltas):
        """Focal + smooth-L1, normalized by #foreground
        (reference retinanet.py:201-249).  Inputs are (B, R, ...) arrays."""
        k = self.num_classes
        logits = pred_class_logits.reshape(-1, k)
        deltas = pred_anchor_deltas.reshape(-1, 4)
        gt_classes = gt_classes.reshape(-1)
        gt_deltas = gt_anchors_deltas.reshape(-1, 4)

        valid = gt_classes >= 0
        foreground = valid & (gt_classes != k)
        num_foreground = jnp.maximum(jnp.sum(foreground), 1)

        target = jax.nn.one_hot(jnp.where(foreground, gt_classes, k), k, dtype=logits.dtype)
        cls_loss_el = sigmoid_focal_loss(
            logits, target, alpha=self.focal_loss_alpha, gamma=self.focal_loss_gamma
        )
        loss_cls = jnp.sum(jnp.where(valid[:, None], cls_loss_el, 0.0)) / num_foreground

        reg_loss_el = smooth_l1_loss(deltas, gt_deltas, beta=self.smooth_l1_loss_beta)
        loss_box_reg = jnp.sum(jnp.where(foreground[:, None], reg_loss_el, 0.0)) / num_foreground
        return {"loss_cls": loss_cls, "loss_box_reg": loss_box_reg}

    def softmax_cross_entropy_loss(self, gt_classes, pred_class_logits):
        """Fork extra (reference retinanet.py:159-170): softmax CE over the
        K classes with ignore_index=-1 semantics; background (K) contributes
        through the extra column when logits carry K+1, else it is ignored."""
        logits = pred_class_logits.reshape(-1, pred_class_logits.shape[-1])
        gt = gt_classes.reshape(-1)
        valid = (gt >= 0) & (gt < logits.shape[-1])
        safe = jnp.where(valid, gt, 0)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(log_probs, safe[:, None].astype(jnp.int32), axis=-1)[:, 0]
        return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(jnp.sum(valid), 1)

    def smooth_l1_loss_fork(self, gt_classes, gt_anchors_deltas, pred_anchor_deltas):
        """Fork extra (reference retinanet.py:171-194): fg-only smooth-L1 / num_fg."""
        gt = gt_classes.reshape(-1)
        fg = (gt >= 0) & (gt != self.num_classes)
        el = smooth_l1_loss(
            pred_anchor_deltas.reshape(-1, 4), gt_anchors_deltas.reshape(-1, 4), self.smooth_l1_loss_beta
        )
        return jnp.sum(jnp.where(fg[:, None], el, 0.0)) / jnp.maximum(jnp.sum(fg), 1)

    def ce_losses(self, gt_classes, gt_anchors_deltas, pred_class_logits, pred_anchor_deltas):
        """Fork extra (reference retinanet.py:195-200)."""
        return {
            "loss_cls": self.softmax_cross_entropy_loss(gt_classes, pred_class_logits),
            "loss_box_reg": self.smooth_l1_loss_fork(gt_classes, gt_anchors_deltas, pred_anchor_deltas),
        }

    def sigmoid_loss(self, inputs, targets, weights, mode="none", alpha=-1.0, gamma=2.0, reduction="none"):
        """Weighted BCE/focal used by the gambler's detector objective
        (reference retinanet.py:250-307)."""
        p = jax.nn.sigmoid(inputs)
        ce = jnp.maximum(inputs, 0) - inputs * targets + jnp.log1p(jnp.exp(-jnp.abs(inputs)))
        if mode == "focal":
            p_t = p * targets + (1 - p) * (1 - targets)
            loss = ce * (1 - p_t) ** gamma
            if alpha >= 0:
                alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
                loss = alpha_t * loss
        elif mode == "none":
            loss = ce
        else:
            raise ValueError("unknown sigmoid_loss mode: {}".format(mode))
        loss = weights * loss
        if reduction == "mean":
            return jnp.mean(loss)
        if reduction == "sum":
            return jnp.sum(loss)
        return loss

    # -- pure step functions -------------------------------------------------
    def forward_train(self, params, batch):
        """The fork's training forward 5-tuple (reference retinanet.py:141-146).

        Returns (images, preds, gt_classes, mask, losses) where
        preds = {"pred_class_logits": (B, R, K), "pred_proposal_deltas": (B, R, 4)}.
        """
        images = self.normalize(batch["image"])
        box_cls, box_delta = self.module.apply({"params": params}, images)
        h, w = batch["image"].shape[1:3]
        anchors = self.anchors_for(h, w)
        anchors_cat = Boxes.cat(anchors).tensor

        logits = cat_levels_N_sumHWA_K(box_cls, self.num_classes)
        deltas = cat_levels_N_sumHWA_K(box_delta, 4)

        gt_classes, gt_deltas = self.get_ground_truth(anchors_cat, batch)
        gt_classes = jax.lax.stop_gradient(gt_classes)
        gt_deltas = jax.lax.stop_gradient(gt_deltas)
        mask = self.get_picky_ground_truth(anchors_cat, batch)
        losses = self.losses(gt_classes, gt_deltas, logits, deltas)
        preds = {
            "pred_class_logits": logits,
            "pred_proposal_deltas": deltas,
            # per-level NHWC maps for the gambler (reference passes the raw
            # per-level head outputs to LayeredUnetGambler)
            "pred_class_logits_levels": box_cls,
            "pred_proposal_deltas_levels": box_delta,
        }
        return images, preds, gt_classes, mask, losses

    def loss_fn(self, params, batch, rng=None):
        _, _, _, _, losses = self.forward_train(params, batch)
        total = sum(losses.values())
        return total, losses

    def inference_fn(self, params, batch):
        """Batched static-shape inference -> padded detections dict."""
        images = self.normalize(batch["image"])
        box_cls, box_delta = self.module.apply({"params": params}, images)
        h, w = batch["image"].shape[1:3]
        anchors = self.anchors_for(h, w)

        cls_per_level = [permute_to_N_HWA_K(t, self.num_classes) for t in box_cls]
        reg_per_level = [permute_to_N_HWA_K(t, 4) for t in box_delta]
        anchor_tensors = [a.tensor for a in anchors]

        def single_image(cls_levels, reg_levels):
            boxes_all, scores_all, classes_all, valid_all = [], [], [], []
            for cls_i, reg_i, anchors_i in zip(cls_levels, reg_levels, anchor_tensors):
                # top-k on raw logits (sigmoid is monotonic): avoids
                # materializing HWA*K fp32 probabilities per level — the
                # batched decode otherwise peaks multiple GB and the
                # selected-k sigmoid is exact
                logits = cls_i.reshape(-1)  # (HWA*K,)
                k = min(self.topk_candidates, logits.shape[0])
                if self.approx_topk and k < logits.shape[0]:
                    # exact TPU sort of the (HWA*K,) candidate tensor costs
                    # ~150 ms/batch; approx_max_k at recall 0.99 only risks
                    # the low-score candidate tail (TPU.APPROX_TOPK)
                    top_logits, top_idx = jax.lax.approx_max_k(
                        logits, k, recall_target=0.99
                    )
                else:
                    top_logits, top_idx = jax.lax.top_k(logits, k)
                top_scores = jax.nn.sigmoid(top_logits.astype(jnp.float32))
                keep = top_scores > self.score_threshold
                anchor_idx = top_idx // self.num_classes
                class_idx = top_idx % self.num_classes
                pred_boxes = self.box2box_transform.apply_deltas(
                    reg_i[anchor_idx], anchors_i[anchor_idx]
                )
                boxes_all.append(pred_boxes)
                scores_all.append(top_scores)
                classes_all.append(class_idx)
                valid_all.append(keep)
            boxes = jnp.concatenate(boxes_all, axis=0)
            scores = jnp.concatenate(scores_all, axis=0)
            classes = jnp.concatenate(classes_all, axis=0)
            valid = jnp.concatenate(valid_all, axis=0)

            keep = batched_nms_mask(boxes, scores, classes, self.nms_threshold, valid)
            kept_scores = jnp.where(keep, scores, -jnp.inf)
            d = self.max_detections_per_image
            top_scores, idx = jax.lax.top_k(kept_scores, min(d, kept_scores.shape[0]))
            det_valid = top_scores > -jnp.inf
            return {
                "boxes": boxes[idx],
                "scores": jnp.where(det_valid, top_scores, 0.0),
                "classes": classes[idx],
                "valid": det_valid,
            }

        # decode in sub-batches: exact top_k's sort workspace over the
        # per-level (HWA*K) candidate buffers peaks ~GBs fully vmapped at
        # batch 8 (HBM overflow); lax.map over pairs bounds the transient at
        # 2 images' worth.  approx_max_k's workspace is linear, so the
        # approx path vmaps the whole batch — the lax.map while-loop
        # serialized 4 chunks and copied each chunk's logits (~25 ms/batch).
        b = batch["image"].shape[0]
        chunk = b if self.approx_topk else (2 if b % 2 == 0 else 1)
        if b > chunk:
            stacked = (
                [x.reshape(b // chunk, chunk, *x.shape[1:]) for x in cls_per_level],
                [x.reshape(b // chunk, chunk, *x.shape[1:]) for x in reg_per_level],
            )
            dets = jax.lax.map(
                lambda t: jax.vmap(single_image)(t[0], t[1]), stacked
            )
            dets = {k: v.reshape(b, *v.shape[2:]) for k, v in dets.items()}
        else:
            dets = jax.vmap(single_image)(cls_per_level, reg_per_level)
        dets = scale_detections(dets, batch["image_size"], batch["out_size"])
        raw_preds = {
            "pred_class_logits": cat_levels_N_sumHWA_K(box_cls, self.num_classes),
            "pred_proposal_deltas": cat_levels_N_sumHWA_K(box_delta, 4),
        }
        return images, raw_preds, dets

    # -- detectron2-style host API ------------------------------------------
    def __call__(self, batched_inputs: List[Dict]):
        batch = {k: jnp.asarray(v) for k, v in self.prepare_batch(batched_inputs).items()}
        params = self.params  # set by checkpointer/trainer

        if self.training:
            fwd = self._jitted("forward_train", self.forward_train)
            images, preds, gt_classes, mask, losses = fwd(params, batch)
            return images, preds, gt_classes, mask, losses

        fwd = self._jitted("inference", self.inference_fn)
        images, raw_preds, dets = fwd(params, batch)
        processed_results = []
        for i, x in enumerate(batched_inputs):
            valid = np.asarray(dets["valid"][i])
            out_size = (int(batch["out_size"][i, 0]), int(batch["out_size"][i, 1]))
            r = Instances(out_size)
            r.pred_boxes = Boxes(np.asarray(dets["boxes"][i])[valid])
            r.scores = jnp.asarray(np.asarray(dets["scores"][i])[valid])
            r.pred_classes = jnp.asarray(np.asarray(dets["classes"][i])[valid])
            processed_results.append({"instances": r})
        # fork eval contract: 4-tuple (reference retinanet.py:148-157)
        return images, raw_preds, None, processed_results
