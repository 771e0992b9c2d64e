"""TridentNet meta-architecture integration.

Parity with projects/TridentNet/tridentnet/trident_rpn.py:10-40 and
trident_rcnn.py:8-120: the trident backbone emits the res4 feature with the
branches stacked into the batch dimension; RPN and the C4 ROI heads then run
per-branch (the GT is replicated per branch for training), and at inference
``merge_branch_instances`` pools the branches' detections per image through
one more class-aware NMS.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from fsgd_tpu.models.build import META_ARCH_REGISTRY
from fsgd_tpu.models.meta_arch.rcnn import GeneralizedRCNN
from fsgd_tpu.ops.nms import batched_nms_mask


def _repeat_gt(batch: Dict, num_branch: int) -> Dict:
    """Tile GT fields along the batch dim (images stay single; the backbone
    itself fans out to branches)."""
    out = dict(batch)
    for k in ("gt_boxes", "gt_classes", "gt_valid", "image_size", "out_size", "gt_masks", "gt_keypoints"):
        if k in batch:
            out[k] = jnp.concatenate([batch[k]] * num_branch, axis=0)
    return out


def merge_branch_instances(dets: Dict, num_branch: int, nms_thresh: float, topk: int) -> Dict:
    """(3B, D, ...) per-branch detections -> (B, D, ...) merged
    (reference trident_rcnn.py merge_branch_instances)."""
    if num_branch == 1:
        return dets
    tb, d = dets["boxes"].shape[:2]
    b = tb // num_branch

    def regroup(x):
        # branches are stacked as [br0 images..., br1 images..., br2 ...]
        return jnp.concatenate(
            [x[i * b : (i + 1) * b] for i in range(num_branch)], axis=1
        )  # (B, 3D, ...)

    boxes = regroup(dets["boxes"])
    scores = regroup(dets["scores"])
    classes = regroup(dets["classes"])
    valid = regroup(dets["valid"])

    def per_image(bx, sc, cl, v):
        keep = batched_nms_mask(bx, sc, cl, nms_thresh, v)
        kept = jnp.where(keep, sc, -jnp.inf)
        k = min(topk, kept.shape[0])
        top, idx = jax.lax.top_k(kept, k)
        return {
            "boxes": bx[idx],
            "scores": jnp.where(top > -jnp.inf, top, 0.0),
            "classes": cl[idx],
            "valid": top > -jnp.inf,
        }

    return jax.vmap(per_image)(boxes, scores, classes, valid)


@META_ARCH_REGISTRY.register()
class TridentRCNN(GeneralizedRCNN):
    """GeneralizedRCNN over the trident backbone (branch-stacked batch)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.num_branch = cfg.MODEL.TRIDENT.NUM_BRANCH

    def loss_fn(self, params, batch, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        r_rpn, r_roi = jax.random.split(rng)
        images = self.normalize(batch["image"])
        features = self.backbone.apply({"params": params["backbone"]}, images)
        batch_rep = _repeat_gt(batch, self.num_branch)
        proposals, proposal_losses = self.proposal_generator(
            params["proposal_generator"], features, batch_rep, r_rpn, training=True
        )
        roi_losses = self.roi_heads.forward_train(
            params["roi_heads"], features, proposals, batch_rep, r_roi
        )
        losses = {**proposal_losses, **roi_losses}
        return sum(losses.values()), losses

    def inference_fn(self, params, batch):
        images = self.normalize(batch["image"])
        features = self.backbone.apply({"params": params["backbone"]}, images)
        batch_rep = _repeat_gt(batch, self.num_branch)
        proposals, _ = self.proposal_generator(
            params["proposal_generator"], features, batch_rep, None, training=False
        )
        dets = self.roi_heads.forward_inference(params["roi_heads"], features, proposals, batch_rep)
        dets = merge_branch_instances(
            dets, self.num_branch, self.roi_heads.nms_thresh, self.roi_heads.detections_per_image
        )
        from fsgd_tpu.models.postprocessing import scale_detections

        return scale_detections(dets, batch["image_size"], batch["out_size"])


# --------------------------------------------------------------------------- #
# Registry aliases so the reference's config surface resolves unchanged
# (projects/TridentNet/configs/Base-TridentNet-Fast-C4.yaml names
# PROPOSAL_GENERATOR "TridentRPN" and ROI_HEADS "TridentRes5ROIHeads").
# In this TPU design the branch axis is folded into the batch by TridentRCNN
# (_repeat_gt above), so the per-branch RPN/ROI computation IS the standard
# RPN / Res5ROIHeads over the stacked batch — the aliases carry no extra code.
# --------------------------------------------------------------------------- #
from fsgd_tpu.models.build import PROPOSAL_GENERATOR_REGISTRY, ROI_HEADS_REGISTRY  # noqa: E402
from fsgd_tpu.models.proposal_generator.rpn import RPN  # noqa: E402
from fsgd_tpu.models.roi_heads.res5_roi_heads import Res5ROIHeads  # noqa: E402


@PROPOSAL_GENERATOR_REGISTRY.register()
class TridentRPN(RPN):
    pass


@ROI_HEADS_REGISTRY.register()
class TridentRes5ROIHeads(Res5ROIHeads):
    pass
