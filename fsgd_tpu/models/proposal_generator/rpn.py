"""Region Proposal Network.

Parity with detectron2/modeling/proposal_generator/rpn.py:31-188 and
rpn_outputs.py:60-443: ``StandardRPNHead`` (shared 3x3 conv + 1x1 objectness /
delta convs per level), GT assignment with the [0.3, 0.7] matcher and 256/img
resampling (losses normalized by ``batch_size_per_image * num_images``,
rpn_outputs.py:392), and ``find_top_rpn_proposals`` (per-level top-k -> clip
-> min-size filter -> per-level NMS -> global top-k, rpn_outputs.py:60-151).

TPU design: everything is batched/static — per-level NMS runs as a vmapped
keep-mask, proposals come out as fixed-size (B, POST_NMS_TOPK, 4) with a
validity mask.  A ``nms_cap`` truncates the per-level NMS input by score
(IoU-matrix memory is quadratic); with FPN's per-level pre_nms_topk=2000 the
cap is inactive and results are exact.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.box_transform import Box2BoxTransform
from ...ops.matcher import Matcher
from ...ops.nms import nms_mask
from ...ops.sampling import subsample_labels_mask
from ...structures import Boxes, pairwise_iou
from ..build import PROPOSAL_GENERATOR_REGISTRY, RPN_HEAD_REGISTRY, build_anchor_generator
from ..meta_arch.retinanet import permute_to_N_HWA_K


@RPN_HEAD_REGISTRY.register()
class StandardRPNHead(nn.Module):
    """3x3 conv tower + 1x1 objectness / anchor-delta convs, shared across levels."""

    num_anchors: int
    box_dim: int = 4
    channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]):
        conv = nn.Conv(
            self.channels,
            (3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )
        objectness = nn.Conv(
            self.num_anchors,
            (1, 1),
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="objectness_logits",
        )
        deltas = nn.Conv(
            self.num_anchors * self.box_dim,
            (1, 1),
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="anchor_deltas",
        )
        logits, bbox = [], []
        for f in features:
            t = nn.relu(conv(f))
            logits.append(objectness(t).astype(jnp.float32))
            bbox.append(deltas(t).astype(jnp.float32))
        return logits, bbox


@PROPOSAL_GENERATOR_REGISTRY.register()
class RPN:
    """Functional RPN orchestrator: owns the head module + matching/NMS logic."""

    def __init__(self, cfg, input_shapes: Dict[str, Any]):
        self.in_features = list(cfg.MODEL.RPN.IN_FEATURES)
        self.nms_thresh = cfg.MODEL.RPN.NMS_THRESH
        self.batch_size_per_image = cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE
        self.positive_fraction = cfg.MODEL.RPN.POSITIVE_FRACTION
        self.smooth_l1_beta = cfg.MODEL.RPN.SMOOTH_L1_BETA
        self.loss_weight = cfg.MODEL.RPN.LOSS_WEIGHT
        self.min_box_side_len = cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE
        self.boundary_threshold = cfg.MODEL.RPN.BOUNDARY_THRESH
        self.pre_nms_topk = {
            True: cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN,
            False: cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
        }
        self.post_nms_topk = {
            True: cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
            False: cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
        }
        self.nms_cap = 4096  # per-level NMS input cap (memory bound; exact for FPN)

        shapes = [input_shapes[f] for f in self.in_features]
        self.strides = [s.stride for s in shapes]
        self.anchor_generator = build_anchor_generator(cfg, shapes)
        num_cell = self.anchor_generator.num_cell_anchors
        assert len(set(num_cell)) == 1
        self.num_anchors = num_cell[0]
        self.box_dim = self.anchor_generator.box_dim

        self.box2box_transform = Box2BoxTransform(weights=cfg.MODEL.RPN.BBOX_REG_WEIGHTS)
        self.anchor_matcher = Matcher(
            cfg.MODEL.RPN.IOU_THRESHOLDS, cfg.MODEL.RPN.IOU_LABELS, allow_low_quality_matches=True
        )
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        self.head_module = RPN_HEAD_REGISTRY.get(cfg.MODEL.RPN.HEAD_NAME)(
            num_anchors=self.num_anchors,
            box_dim=self.box_dim,
            channels=shapes[0].channels,
            dtype=dtype,
        )


    # -- box-type hooks (overridden by RRPN for rotated boxes) ---------------
    def _pairwise_iou(self, gt_boxes, anchors):
        return pairwise_iou(gt_boxes, anchors)

    def _match_anchors(self, gt_boxes, gt_valid, anchors_cat):
        """(matches, labels) without materializing the (G, R) IoU matrix.

        The streamed matcher recomputes the cheap axis-aligned IoU into each
        reduction; RRPN overrides this with the dense path (rotated IoU is
        polygon clipping — recomputing it would double real compute).
        """
        matches, labels, _ = self.anchor_matcher.match_streamed(
            gt_boxes, gt_valid, anchors_cat, self._pairwise_iou
        )
        return matches, labels

    def _clip_boxes(self, boxes, image_size):
        return Boxes(boxes).clip((image_size[0], image_size[1])).tensor

    def _nonempty(self, boxes):
        wh = jnp.stack([boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]], -1)
        return jnp.all(wh > self.min_box_side_len, axis=-1)

    def _nms(self, boxes, scores, valid):
        return nms_mask(boxes, scores, self.nms_thresh, valid=valid)

    def _inside_image(self, anchors_cat, image_size, thresh):
        return Boxes(anchors_cat).inside_box((image_size[0], image_size[1]), thresh)

    def init_params(self, rng, feature_shapes: Sequence[Tuple[int, int, int]]):
        dummy = [jnp.zeros((1, h, w, c), jnp.float32) for (h, w, c) in feature_shapes]
        return self.head_module.init(rng, dummy)["params"]

    # -- training targets ----------------------------------------------------
    def get_ground_truth(self, anchors_cat: jnp.ndarray, batch, rng):
        """(B, R) labels in {-1, 0, 1} after resampling + (B, R, 4) deltas."""

        def per_image(gt_boxes, gt_valid, image_size, rng_i):
            matched_idxs, labels = self._match_anchors(gt_boxes, gt_valid, anchors_cat)
            labels = labels.astype(jnp.int32)
            if self.boundary_threshold >= 0:
                inside = self._inside_image(anchors_cat, image_size, self.boundary_threshold)
                labels = jnp.where(inside, labels, -1)
            # one-hot contraction, not gt_boxes[matched_idxs]: the (R,) gather
            # of 16-byte rows runs ~10ms/step on TPU; the (R, G) @ (G, 4)
            # matmul is bandwidth-bound (~1ms)
            onehot = jax.nn.one_hot(matched_idxs, gt_boxes.shape[0], dtype=gt_boxes.dtype)
            matched_gt = onehot @ gt_boxes
            deltas = self.box2box_transform.get_deltas(anchors_cat, matched_gt)
            # resample: everything outside the sample becomes ignore (-1)
            pos_mask, neg_mask = subsample_labels_mask(
                labels, self.batch_size_per_image, self.positive_fraction, 0, rng_i
            )
            labels = jnp.where(pos_mask, 1, jnp.where(neg_mask, 0, -1))
            return labels, deltas

        b = batch["gt_boxes"].shape[0]
        rngs = jax.random.split(rng, b)
        return jax.vmap(per_image)(batch["gt_boxes"], batch["gt_valid"], batch["image_size"], rngs)

    def losses(self, gt_labels, gt_deltas, pred_logits, pred_deltas):
        """Sampled BCE + smooth-L1, normalized by batch*256 (rpn_outputs.py:392)."""
        from ...ops.losses import sigmoid_cross_entropy, smooth_l1_loss

        b = gt_labels.shape[0]
        valid = gt_labels >= 0
        pos = gt_labels == 1
        obj_loss = jnp.sum(
            jnp.where(valid, sigmoid_cross_entropy(pred_logits, gt_labels.astype(jnp.float32)), 0.0)
        )
        loc_loss = jnp.sum(
            jnp.where(pos[..., None], smooth_l1_loss(pred_deltas, gt_deltas, self.smooth_l1_beta), 0.0)
        )
        normalizer = 1.0 / (self.batch_size_per_image * b)
        return {
            "loss_rpn_cls": obj_loss * normalizer * self.loss_weight,
            "loss_rpn_loc": loc_loss * normalizer * self.loss_weight,
        }

    # -- proposal selection --------------------------------------------------
    def find_top_proposals(self, logits_per_level, deltas_per_level, anchors, batch, training: bool):
        """Static-shape find_top_rpn_proposals (rpn_outputs.py:60-151).

        Returns dict with "boxes" (B, P, 4), "scores" (B, P), "valid" (B, P).
        """
        pre_nms = self.pre_nms_topk[training]
        post_nms = self.post_nms_topk[training]

        def per_image(logits_levels, deltas_levels, image_size):
            all_boxes, all_scores, all_valid = [], [], []
            for logits_i, deltas_i, anchors_i in zip(logits_levels, deltas_levels, anchors):
                scores = logits_i.reshape(-1)  # (HWA,)
                k = min(pre_nms, scores.shape[0], self.nms_cap)
                top_scores, top_idx = jax.lax.top_k(scores, k)
                boxes = self.box2box_transform.apply_deltas(
                    deltas_i.reshape(-1, self.box_dim)[top_idx], anchors_i.tensor[top_idx]
                )
                boxes = self._clip_boxes(boxes, image_size)
                nonempty = self._nonempty(boxes)
                keep = self._nms(boxes, top_scores, nonempty)
                all_boxes.append(boxes)
                all_scores.append(top_scores)
                all_valid.append(keep)
            boxes = jnp.concatenate(all_boxes, 0)
            scores = jnp.concatenate(all_scores, 0)
            valid = jnp.concatenate(all_valid, 0)
            kept_scores = jnp.where(valid, scores, -jnp.inf)
            p = min(post_nms, kept_scores.shape[0])
            top_scores, idx = jax.lax.top_k(kept_scores, p)
            return {
                "boxes": boxes[idx],
                "scores": top_scores,
                "valid": top_scores > -jnp.inf,
            }

        return jax.vmap(per_image)(logits_per_level, deltas_per_level, batch["image_size"])

    def __call__(self, params, features: Dict[str, jnp.ndarray], batch, rng=None, training=True):
        """Returns (proposals dict, losses dict)."""
        feats = [features[f] for f in self.in_features]
        logits, deltas = self.head_module.apply({"params": params}, feats)
        grid_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = self.anchor_generator(grid_sizes)

        logits_flat = [permute_to_N_HWA_K(l, 1)[..., 0] for l in logits]  # (B, HWA)
        deltas_flat = [permute_to_N_HWA_K(d, self.box_dim) for d in deltas]  # (B, HWA, D)

        losses = {}
        if training:
            anchors_cat = jnp.concatenate([a.tensor for a in anchors], axis=0)
            gt_labels, gt_deltas = self.get_ground_truth(anchors_cat, batch, rng)
            gt_labels = jax.lax.stop_gradient(gt_labels)
            gt_deltas = jax.lax.stop_gradient(gt_deltas)
            pred_logits_cat = jnp.concatenate(logits_flat, axis=1)
            pred_deltas_cat = jnp.concatenate(deltas_flat, axis=1)
            losses = self.losses(gt_labels, gt_deltas, pred_logits_cat, pred_deltas_cat)

        # proposal decoding/NMS sees no gradients (reference: with no_grad)
        proposals = self.find_top_proposals(
            [jax.lax.stop_gradient(l) for l in logits_flat],
            [jax.lax.stop_gradient(d) for d in deltas_flat],
            anchors,
            batch,
            training,
        )
        return proposals, losses
