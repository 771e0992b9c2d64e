"""Panoptic FPN meta-architecture.

Parity with detectron2/modeling/meta_arch/panoptic_fpn.py:19-216: a
GeneralizedRCNN (instance branch) plus a SemSegFPNHead (stuff branch), losses
combined with INSTANCE_LOSS_WEIGHT, and the host-side
``combine_semantic_and_instance_outputs`` heuristic (confidence/overlap/stuff
area thresholds) for panoptic inference.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..build import META_ARCH_REGISTRY
from .rcnn import GeneralizedRCNN
from .semantic_seg import SemSegHeadWrapper

__all__ = ["PanopticFPN", "combine_semantic_and_instance_outputs"]


@META_ARCH_REGISTRY.register()
class PanopticFPN(GeneralizedRCNN):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.instance_loss_weight = cfg.MODEL.PANOPTIC_FPN.INSTANCE_LOSS_WEIGHT
        self.combine_on = cfg.MODEL.PANOPTIC_FPN.COMBINE.ENABLED
        self.combine_overlap_threshold = cfg.MODEL.PANOPTIC_FPN.COMBINE.OVERLAP_THRESH
        self.combine_stuff_area_limit = cfg.MODEL.PANOPTIC_FPN.COMBINE.STUFF_AREA_LIMIT
        self.combine_instances_confidence_threshold = (
            cfg.MODEL.PANOPTIC_FPN.COMBINE.INSTANCES_CONFIDENCE_THRESH
        )
        self.sem_seg_head = SemSegHeadWrapper(cfg, self.backbone.output_shape())

    def init_params(self, rng, image_size=(128, 128), batch: int = 1):
        r1, r2 = jax.random.split(rng)
        params = super().init_params(r1, image_size, batch)
        dummy = jnp.zeros((batch, image_size[0], image_size[1], 3), jnp.float32)
        feats = self.backbone.apply({"params": params["backbone"]}, dummy)
        shapes = [tuple(feats[f].shape[1:]) for f in self.sem_seg_head.in_features]
        params["sem_seg_head"] = self.sem_seg_head.init_params(r2, shapes)
        return params

    def loss_fn(self, params, batch, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        r_rpn, r_roi = jax.random.split(rng)
        images, features = self._features(params, batch)
        _, sem_losses = self.sem_seg_head(params["sem_seg_head"], features, batch, True)
        proposals, proposal_losses = self._proposals(params, features, batch, r_rpn, True)
        roi_losses = self.roi_heads.forward_train(params["roi_heads"], features, proposals, batch, r_roi)
        losses = dict(sem_losses)
        losses.update({k: v * self.instance_loss_weight for k, v in roi_losses.items()})
        # NOTE: the reference scales only the ROI-head (detector) losses;
        # proposal/RPN losses enter UNWEIGHTED (panoptic_fpn.py:103-106)
        losses.update(proposal_losses)
        return sum(losses.values()), losses

    def inference_fn(self, params, batch):
        images, features = self._features(params, batch)
        proposals, _ = self._proposals(params, features, batch, None, False)
        dets = self.roi_heads.forward_inference(params["roi_heads"], features, proposals, batch)
        from ..postprocessing import scale_detections

        dets = scale_detections(dets, batch["image_size"], batch["out_size"])
        sem_logits, _ = self.sem_seg_head(params["sem_seg_head"], features, batch, False)
        n, h, w, c = sem_logits.shape
        cs = self.sem_seg_head.common_stride
        sem_logits = jax.image.resize(sem_logits, (n, h * cs, w * cs, c), method="bilinear")
        dets["sem_seg_logits"] = sem_logits
        return dets

    # -- detectron2-style host API (reference panoptic_fpn.py:49-118) --------
    def __call__(self, batched_inputs: List[Dict]):
        if self.training:
            return super().__call__(batched_inputs)

        from .rcnn import detections_to_instances
        from .semantic_seg import sem_seg_postprocess_host

        batch = {k: jnp.asarray(v) for k, v in self.prepare_batch(batched_inputs).items()}
        fwd = self._jitted("inference", self.inference_fn)
        dets = fwd(self.params, batch)
        sem_logits = dets.pop("sem_seg_logits")
        processed = detections_to_instances(dets, batch)

        for i, res in enumerate(processed):
            image_size = (int(batch["image_size"][i, 0]), int(batch["image_size"][i, 1]))
            out_size = (int(batch["out_size"][i, 0]), int(batch["out_size"][i, 1]))
            sem = sem_seg_postprocess_host(sem_logits[i], image_size, out_size)
            res["sem_seg"] = sem
            if not self.combine_on:
                continue
            inst = res["instances"]
            scores = np.asarray(inst.scores)
            classes = np.asarray(inst.pred_classes)
            if hasattr(inst, "pred_masks_soft") and len(inst) > 0:
                from ...ops.paste_masks import paste_masks_in_image

                masks = paste_masks_in_image(
                    np.asarray(inst.pred_masks_soft), inst.pred_boxes, out_size
                )
            else:
                masks = np.zeros((len(inst),) + out_size, dtype=bool)
            pan, segments = combine_semantic_and_instance_outputs(
                masks,
                scores,
                classes,
                sem.argmax(axis=-1),
                overlap_threshold=self.combine_overlap_threshold,
                stuff_area_limit=self.combine_stuff_area_limit,
                instances_confidence_threshold=self.combine_instances_confidence_threshold,
            )
            res["panoptic_seg"] = (pan, segments)
        return processed


def combine_semantic_and_instance_outputs(
    instance_masks: np.ndarray,  # (N, H, W) bool, score-sorted
    instance_scores: np.ndarray,
    instance_classes: np.ndarray,
    semantic_seg: np.ndarray,  # (H, W) argmaxed labels
    overlap_threshold: float = 0.5,
    stuff_area_limit: int = 4096,
    instances_confidence_threshold: float = 0.5,
):
    """The reference combine heuristic (panoptic_fpn.py:120-216) on host numpy.

    Returns (panoptic_seg (H, W) int32 segment ids, segments_info list).
    """
    panoptic_seg = np.zeros(semantic_seg.shape, dtype=np.int32)
    current_segment_id = 0
    segments_info = []

    order = np.argsort(-instance_scores)
    for i in order:
        score = float(instance_scores[i])
        if score < instances_confidence_threshold:
            break
        mask = instance_masks[i]
        mask_area = mask.sum()
        if mask_area == 0:
            continue
        intersect = mask & (panoptic_seg > 0)
        intersect_area = intersect.sum()
        if intersect_area * 1.0 / mask_area > overlap_threshold:
            continue
        if intersect_area > 0:
            mask = mask & (panoptic_seg == 0)
        current_segment_id += 1
        panoptic_seg[mask] = current_segment_id
        segments_info.append(
            {
                "id": current_segment_id,
                "isthing": True,
                "score": score,
                "category_id": int(instance_classes[i]),
                "instance_id": int(i),
            }
        )

    semantic_labels = np.unique(semantic_seg)
    for semantic_label in semantic_labels:
        if semantic_label == 0:  # 0 = special "thing" placeholder
            continue
        mask = (semantic_seg == semantic_label) & (panoptic_seg == 0)
        mask_area = mask.sum()
        if mask_area < stuff_area_limit:
            continue
        current_segment_id += 1
        panoptic_seg[mask] = current_segment_id
        segments_info.append(
            {
                "id": current_segment_id,
                "isthing": False,
                "category_id": int(semantic_label),
                "area": int(mask_area),
            }
        )
    return panoptic_seg, segments_info
