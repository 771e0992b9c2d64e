"""Fast R-CNN output losses and inference.

Parity with detectron2/modeling/roi_heads/fast_rcnn.py:41-341:
``FastRCNNOutputs`` (softmax CE mean over sampled rois + smooth-L1 on
class-specific delta columns normalized by total roi count, fast_rcnn.py:264-281),
the fork's ``focal_loss`` variant (fast_rcnn.py:193-216), and
``fast_rcnn_inference`` (score filter -> per-class NMS -> top-k,
fast_rcnn.py:41-118) as a fully batched static-shape program.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.box_transform import Box2BoxTransform
from ...ops.losses import sigmoid_focal_loss, smooth_l1_loss
from ...ops.nms import batched_nms_mask
from ...structures import Boxes

__all__ = ["fast_rcnn_losses", "fast_rcnn_inference_batched", "predict_boxes", "predict_probs"]


def fast_rcnn_losses(
    box2box_transform: Box2BoxTransform,
    pred_class_logits: jnp.ndarray,  # (R, K+1)
    pred_proposal_deltas: jnp.ndarray,  # (R, K*D) or (R, D)
    proposal_boxes: jnp.ndarray,  # (R, 4)
    gt_boxes: jnp.ndarray,  # (R, 4) matched gt per proposal
    gt_classes: jnp.ndarray,  # (R,) in [0, K] (K = background)
    valid: jnp.ndarray,  # (R,) sampled-slot validity
    smooth_l1_beta: float,
    use_focal: bool = False,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
) -> Dict[str, jnp.ndarray]:
    num_classes = pred_class_logits.shape[1] - 1
    box_dim = proposal_boxes.shape[-1]
    num_instances = jnp.maximum(jnp.sum(valid), 1)
    fg = valid & (gt_classes >= 0) & (gt_classes < num_classes)

    if use_focal:
        # fork variant (fast_rcnn.py:193-216): sigmoid focal over the K
        # foreground logits, sum / num_fg
        num_fg = jnp.maximum(jnp.sum(fg), 1)
        target = jax.nn.one_hot(jnp.where(fg, gt_classes, num_classes), num_classes + 1)[:, :num_classes]
        el = sigmoid_focal_loss(
            pred_class_logits[:, :num_classes], target, alpha=focal_alpha, gamma=focal_gamma
        )
        loss_cls = jnp.sum(jnp.where(valid[:, None], el, 0.0)) / num_fg
    else:
        log_probs = jax.nn.log_softmax(pred_class_logits, axis=-1)
        # one-hot contraction, not take_along_axis: a (R,) row gather lowers
        # to ~1us/row dynamic-slices on TPU (same fix as the RPN one-hot GT)
        onehot = jax.nn.one_hot(gt_classes, num_classes + 1, dtype=log_probs.dtype)
        nll = -jnp.sum(log_probs * onehot, axis=-1)
        loss_cls = jnp.sum(jnp.where(valid, nll, 0.0)) / num_instances

    # class-specific delta columns for the gt class
    gt_deltas = box2box_transform.get_deltas(proposal_boxes, gt_boxes)
    cls_agnostic = pred_proposal_deltas.shape[-1] == box_dim
    if cls_agnostic:
        fg_pred_deltas = pred_proposal_deltas
    else:
        r = pred_proposal_deltas.shape[0]
        per_class = pred_proposal_deltas.reshape(r, num_classes, box_dim)
        idx = jnp.clip(gt_classes, 0, num_classes - 1)
        # one-hot contraction instead of a per-row gather (see loss_cls note)
        sel = jax.nn.one_hot(idx, num_classes, dtype=per_class.dtype)
        fg_pred_deltas = jnp.einsum("rk,rkd->rd", sel, per_class)
    el = smooth_l1_loss(fg_pred_deltas, gt_deltas, smooth_l1_beta)
    # normalized by the TOTAL number of regions (fast_rcnn.py:281)
    loss_box_reg = jnp.sum(jnp.where(fg[:, None], el, 0.0)) / num_instances
    return {"loss_cls": loss_cls, "loss_box_reg": loss_box_reg}


def predict_boxes(box2box_transform, pred_proposal_deltas, proposal_boxes):
    """(P, K*D) deltas + (P, D) proposals -> (P, K, D) decoded boxes."""
    box_dim = proposal_boxes.shape[-1]
    decoded = box2box_transform.apply_deltas(pred_proposal_deltas, proposal_boxes)
    return decoded.reshape(proposal_boxes.shape[0], -1, box_dim)


def predict_probs(pred_class_logits):
    return jax.nn.softmax(pred_class_logits, axis=-1)


def fast_rcnn_inference_batched(
    boxes: jnp.ndarray,  # (B, P, K, 4) class-specific decoded boxes (clipped upstream or here)
    scores: jnp.ndarray,  # (B, P, K+1) softmax probs
    image_sizes: jnp.ndarray,  # (B, 2)
    proposal_valid: jnp.ndarray,  # (B, P)
    score_thresh: float,
    nms_thresh: float,
    topk_per_image: int,
    pre_nms_candidates: int = 2048,
) -> Dict[str, jnp.ndarray]:
    """Static fast_rcnn_inference: returns padded detections dict.

    The reference NMS-es every (roi, class) pair above score_thresh; here the
    candidate set is first truncated to the ``pre_nms_candidates`` best scores
    (quadratic-NMS memory bound).  With P=1000 proposals the survivors above
    0.05 rarely exceed this cap.
    """
    b, p, k = scores.shape[0], scores.shape[1], scores.shape[2] - 1

    def per_image(boxes_i, scores_i, size_i, pvalid_i):
        fg_scores = scores_i[:, :k]  # drop background column
        if boxes_i.shape[1] == 1:  # class-agnostic: broadcast over classes
            boxes_k = jnp.broadcast_to(boxes_i, (p, k, 4))
        else:
            boxes_k = boxes_i
        # clip to image
        hh = size_i[0].astype(jnp.float32)
        ww = size_i[1].astype(jnp.float32)
        boxes_k = jnp.stack(
            [
                jnp.clip(boxes_k[..., 0], 0, ww),
                jnp.clip(boxes_k[..., 1], 0, hh),
                jnp.clip(boxes_k[..., 2], 0, ww),
                jnp.clip(boxes_k[..., 3], 0, hh),
            ],
            axis=-1,
        )
        flat_scores = jnp.where(pvalid_i[:, None], fg_scores, 0.0).reshape(-1)  # (P*K,)
        n_cand = min(pre_nms_candidates, flat_scores.shape[0])
        cand_scores, cand_idx = jax.lax.top_k(flat_scores, n_cand)
        cand_valid = cand_scores > score_thresh
        cand_classes = (cand_idx % k).astype(jnp.int32)
        cand_boxes = boxes_k.reshape(-1, 4)[cand_idx]

        keep = batched_nms_mask(cand_boxes, cand_scores, cand_classes, nms_thresh, cand_valid)
        kept_scores = jnp.where(keep, cand_scores, -jnp.inf)
        d = min(topk_per_image, n_cand)
        top_scores, idx = jax.lax.top_k(kept_scores, d)
        det_valid = top_scores > -jnp.inf
        out = {
            "boxes": cand_boxes[idx],
            "scores": jnp.where(det_valid, top_scores, 0.0),
            "classes": cand_classes[idx],
            "valid": det_valid,
            "proposal_idx": (cand_idx[idx] // k).astype(jnp.int32),
        }
        if d < topk_per_image:
            pad = topk_per_image - d
            out = {
                key: jnp.concatenate([v, jnp.zeros((pad, *v.shape[1:]), v.dtype)], 0)
                for key, v in out.items()
            }
        return out

    return jax.vmap(per_image)(boxes, scores, image_sizes, proposal_valid)
