"""SemanticSegmentor / PanopticFPN / CascadeROIHeads e2e tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from common import synthetic_batch
from test_rcnn import rcnn_cfg, _with_masks_and_kpts

from fsgd_tpu.models import build_model
from fsgd_tpu.models.meta_arch import combine_semantic_and_instance_outputs


def _with_semseg(batch, num_classes=12):
    b, h, w = batch["image"].shape[:3]
    rng = np.random.RandomState(0)
    sem = rng.randint(0, num_classes, (b, h, w)).astype(np.int32)
    sem[:, :8, :] = 255  # some ignore region
    out = dict(batch)
    out["gt_sem_seg"] = sem
    return out


class TestSemanticSegmentor:
    def test_train_and_infer(self):
        cfg = rcnn_cfg()
        cfg.MODEL.META_ARCHITECTURE = "SemanticSegmentor"
        cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 12
        cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
        model = build_model(cfg)
        params = model.init_params(jax.random.PRNGKey(0), image_size=(128, 128))
        batch = _with_semseg(synthetic_batch())
        total, losses = model.loss_fn(params, batch)
        assert np.isfinite(float(total))
        assert "loss_sem_seg" in losses
        out = model.inference_fn(params, batch)
        assert out.shape == (2, 128, 128, 12)


class TestPanopticFPN:
    def test_train_and_infer(self):
        cfg = rcnn_cfg(mask_on=True)
        cfg.MODEL.META_ARCHITECTURE = "PanopticFPN"
        cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 12
        cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
        model = build_model(cfg)
        params = model.init_params(jax.random.PRNGKey(0), image_size=(128, 128))
        batch = _with_semseg(_with_masks_and_kpts(synthetic_batch()))
        total, losses = model.loss_fn(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(total))
        assert "loss_sem_seg" in losses and "loss_mask" in losses
        dets = model.inference_fn(params, batch)
        assert "sem_seg_logits" in dets
        assert dets["sem_seg_logits"].shape == (2, 128, 128, 12)

    def test_combine_heuristic(self):
        h = w = 32
        masks = np.zeros((2, h, w), bool)
        masks[0, :10, :10] = True
        masks[1, 5:12, 5:12] = True  # overlaps mask 0
        scores = np.array([0.9, 0.8])
        classes = np.array([1, 2])
        sem = np.full((h, w), 7)
        sem[:3, :] = 0
        pan, segments = combine_semantic_and_instance_outputs(
            masks, scores, classes, sem, overlap_threshold=0.5, stuff_area_limit=10,
            instances_confidence_threshold=0.5,
        )
        thing_segments = [s for s in segments if s["isthing"]]
        stuff_segments = [s for s in segments if not s["isthing"]]
        assert len(thing_segments) >= 1
        assert len(stuff_segments) == 1 and stuff_segments[0]["category_id"] == 7
        assert pan.max() == len(segments)


class TestCascade:
    def test_cascade_train_and_infer(self):
        cfg = rcnn_cfg()
        cfg.MODEL.ROI_HEADS.NAME = "CascadeROIHeads"
        cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
        model = build_model(cfg)
        params = model.init_params(jax.random.PRNGKey(0), image_size=(128, 128))
        batch = synthetic_batch()
        (total, losses), grads = jax.value_and_grad(model.loss_fn, has_aux=True)(
            params, batch, jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(total))
        # three per-stage loss pairs
        for k in range(3):
            assert "loss_cls_stage{}".format(k) in losses
            assert "loss_box_reg_stage{}".format(k) in losses
        # all stage heads receive gradient
        for k in range(3):
            g = jax.tree_util.tree_leaves(grads["roi_heads"]["box_predictor_{}".format(k)])
            assert max(float(jnp.abs(x).max()) for x in g) > 0
        dets = model.inference_fn(params, batch)
        assert dets["boxes"].shape[0] == 2
