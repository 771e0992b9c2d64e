"""GeneralizedRCNN / ProposalNetwork / FasterRCNNFocalLoss meta-architectures.

Parity with detectron2/modeling/meta_arch/rcnn.py:19-204 (preprocess ->
backbone -> proposals -> roi_heads -> losses/inference) and the fork's
fasterrcnn_focal_loss.py:9-58 (``FasterRCNNFocalLoss``: identical forward,
classification loss routed through the sigmoid-focal variant).

One jitted program per mode: ``loss_fn`` (training) and ``inference_fn``
(eval) — backbone, RPN, ROI sampling, pooling, and NMS all fuse into a single
XLA computation with static shapes.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...structures import Boxes, Instances
from ..build import META_ARCH_REGISTRY, build_backbone, build_proposal_generator, build_roi_heads
from ..postprocessing import scale_detections
from .detector_base import DetectorBase


@META_ARCH_REGISTRY.register()
class GeneralizedRCNN(DetectorBase):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.backbone = build_backbone(cfg)
        self.module = self.backbone  # for size_divisibility
        shapes = self.backbone.output_shape()
        self.proposal_generator = build_proposal_generator(cfg, shapes)
        self.roi_heads = build_roi_heads(cfg, shapes)
        self.load_proposals = cfg.MODEL.LOAD_PROPOSALS

    # -- parameters ---------------------------------------------------------
    def init_params(self, rng, image_size=(128, 128), batch: int = 1):
        r1, r2, r3 = jax.random.split(rng, 3)
        dummy = jnp.zeros((batch, image_size[0], image_size[1], 3), jnp.float32)
        backbone_params = self.backbone.init(r1, dummy)["params"]
        feats = self.backbone.apply({"params": backbone_params}, dummy)
        params = {"backbone": backbone_params, "roi_heads": self.roi_heads.init_params(r3)}
        if self.proposal_generator is not None:
            feat_shapes = [
                tuple(feats[f].shape[1:]) for f in self.proposal_generator.in_features
            ]
            params["proposal_generator"] = self.proposal_generator.init_params(r2, feat_shapes)
        return params

    # -- shared forward pieces ----------------------------------------------
    def _features(self, params, batch):
        images = self.normalize(batch["image"])
        return images, self.backbone.apply({"params": params["backbone"]}, images)

    def _proposals(self, params, features, batch, rng, training):
        if self.load_proposals or self.proposal_generator is None:
            # precomputed proposals arrive in the batch dict
            return (
                {
                    "boxes": batch["proposal_boxes"],
                    "scores": batch["proposal_scores"],
                    "valid": batch["proposal_valid"],
                },
                {},
            )
        return self.proposal_generator(
            params["proposal_generator"], features, batch, rng, training=training
        )

    # -- pure step functions -------------------------------------------------
    def loss_fn(self, params, batch, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        r_rpn, r_roi = jax.random.split(rng)
        images, features = self._features(params, batch)
        proposals, proposal_losses = self._proposals(params, features, batch, r_rpn, True)
        roi_losses = self.roi_heads.forward_train(
            params["roi_heads"], features, proposals, batch, r_roi
        )
        losses = {**proposal_losses, **roi_losses}
        total = sum(losses.values())
        return total, losses

    def inference_fn(self, params, batch):
        images, features = self._features(params, batch)
        proposals, _ = self._proposals(params, features, batch, None, False)
        dets = self.roi_heads.forward_inference(params["roi_heads"], features, proposals, batch)
        dets = scale_detections(dets, batch["image_size"], batch["out_size"])
        return dets

    # -- detectron2-style host API -------------------------------------------
    def __call__(self, batched_inputs: List[Dict]):
        batch = {k: jnp.asarray(v) for k, v in self.prepare_batch(batched_inputs).items()}
        params = self.params

        if self.training:
            fwd = self._jitted("loss", self.loss_fn)
            total, losses = fwd(params, batch, jax.random.PRNGKey(int(np.random.randint(1 << 31))))
            return losses

        fwd = self._jitted("inference", self.inference_fn)
        dets = fwd(params, batch)
        return detections_to_instances(dets, batch)


def detections_to_instances(dets: Dict, batch) -> List[Dict]:
    """Convert the padded detections dict into reference-style outputs."""
    out = []
    b = dets["boxes"].shape[0]
    for i in range(b):
        valid = np.asarray(dets["valid"][i])
        out_size = (int(batch["out_size"][i, 0]), int(batch["out_size"][i, 1]))
        r = Instances(out_size)
        r.pred_boxes = Boxes(np.asarray(dets["boxes"][i])[valid])
        r.scores = jnp.asarray(np.asarray(dets["scores"][i])[valid])
        r.pred_classes = jnp.asarray(np.asarray(dets["classes"][i])[valid])
        if "masks" in dets:
            r.pred_masks_soft = jnp.asarray(np.asarray(dets["masks"][i])[valid])
        if "mask_boxes" in dets:
            # masks defined on a frame other than pred_boxes (e.g. TensorMask anchors)
            r.pred_mask_boxes = Boxes(np.asarray(dets["mask_boxes"][i])[valid])
        if "keypoints" in dets:
            r.pred_keypoints = jnp.asarray(np.asarray(dets["keypoints"][i])[valid])
        if "densepose" in dets:
            # (D, S, S, 4) stacked IUV banks: coarse segm, fine segm, U, V
            # (DensePose project, fsgd_tpu/projects/densepose/roi_head.py)
            r.pred_densepose = np.asarray(dets["densepose"][i])[valid]
        out.append({"instances": r})
    return out


@META_ARCH_REGISTRY.register()
class ProposalNetwork(DetectorBase):
    """RPN-only model producing proposals as output (reference rcnn.py:152-204)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.backbone = build_backbone(cfg)
        self.module = self.backbone
        self.proposal_generator = build_proposal_generator(cfg, self.backbone.output_shape())

    def init_params(self, rng, image_size=(128, 128), batch: int = 1):
        r1, r2 = jax.random.split(rng)
        dummy = jnp.zeros((batch, image_size[0], image_size[1], 3), jnp.float32)
        backbone_params = self.backbone.init(r1, dummy)["params"]
        feats = self.backbone.apply({"params": backbone_params}, dummy)
        feat_shapes = [tuple(feats[f].shape[1:]) for f in self.proposal_generator.in_features]
        return {
            "backbone": backbone_params,
            "proposal_generator": self.proposal_generator.init_params(r2, feat_shapes),
        }

    def loss_fn(self, params, batch, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        images = self.normalize(batch["image"])
        features = self.backbone.apply({"params": params["backbone"]}, images)
        _, losses = self.proposal_generator(
            params["proposal_generator"], features, batch, rng, training=True
        )
        total = sum(losses.values())
        return total, losses

    def inference_fn(self, params, batch):
        images = self.normalize(batch["image"])
        features = self.backbone.apply({"params": params["backbone"]}, images)
        proposals, _ = self.proposal_generator(
            params["proposal_generator"], features, batch, None, training=False
        )
        dets = {
            "boxes": proposals["boxes"],
            "scores": proposals["scores"],
            "classes": jnp.zeros(proposals["scores"].shape, jnp.int32),
            "valid": proposals["valid"],
        }
        return scale_detections(dets, batch["image_size"], batch["out_size"])


@META_ARCH_REGISTRY.register()
class FasterRCNNFocalLoss(GeneralizedRCNN):
    """GeneralizedRCNN with sigmoid-focal ROI classification
    (fork's fasterrcnn_focal_loss.py:9-58)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.roi_heads.use_focal_cls = True
