"""End-to-end two-stage model tests (reference tests/test_model_e2e.py style:
train + eval on synthetic images, empty GT, backprop finiteness)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from common import synthetic_batch

from fsgd_tpu.config import get_cfg
from fsgd_tpu.models import build_model


def rcnn_cfg(mask_on=False, keypoint_on=False, c4=False, focal=False, num_classes=8):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "FasterRCNNFocalLoss" if focal else "GeneralizedRCNN"
    cfg.MODEL.MASK_ON = mask_on
    cfg.MODEL.KEYPOINT_ON = keypoint_on
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = num_classes
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MAX_GT_PER_IMAGE = 10
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 200
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 400
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 200
    if c4:
        cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
        cfg.MODEL.ROI_HEADS.NAME = "Res5ROIHeads"
        cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
        cfg.MODEL.RPN.IN_FEATURES = ["res4"]
        cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 14
    else:
        cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
        cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
        cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
        cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
        cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
        cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
        cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
        cfg.MODEL.ROI_BOX_HEAD.NAME = "FastRCNNConvFCHead"
        cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
        cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
        cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 2
        cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
        cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS = (64, 64)
    return cfg


def _with_masks_and_kpts(batch, stride=4, num_kpts=17):
    b, g = batch["gt_classes"].shape
    h, w = batch["image"].shape[1:3]
    mh, mw = h // stride, w // stride
    masks = np.zeros((b, g, mh, mw), np.float32)
    kpts = np.zeros((b, g, num_kpts, 3), np.float32)
    for i in range(b):
        for j in range(g):
            if batch["gt_valid"][i, j]:
                x1, y1, x2, y2 = batch["gt_boxes"][i, j] / stride
                masks[i, j, int(y1) : int(y2) + 1, int(x1) : int(x2) + 1] = 1.0
                cx = (batch["gt_boxes"][i, j, 0] + batch["gt_boxes"][i, j, 2]) / 2
                cy = (batch["gt_boxes"][i, j, 1] + batch["gt_boxes"][i, j, 3]) / 2
                kpts[i, j, :, 0] = cx
                kpts[i, j, :, 1] = cy
                kpts[i, j, :, 2] = 2
    batch = dict(batch)
    batch["gt_masks"] = masks
    batch["gt_keypoints"] = kpts
    return batch


class TestFasterRCNN:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = rcnn_cfg()
        model = build_model(cfg)
        params = model.init_params(jax.random.PRNGKey(0), image_size=(128, 128))
        return cfg, model, params

    @pytest.mark.slow
    def test_loss_and_grad(self, setup):
        cfg, model, params = setup
        batch = synthetic_batch()
        (total, losses), grads = jax.value_and_grad(model.loss_fn, has_aux=True)(
            params, batch, jax.random.PRNGKey(1)
        )
        assert set(losses.keys()) == {"loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"}
        assert np.isfinite(float(total))
        g_max = max(
            np.abs(np.asarray(v)).max()
            for k, v in jax.tree_util.tree_flatten_with_path(grads["roi_heads"])[0]
        )
        assert g_max > 0

    def test_empty_gt(self, setup):
        cfg, model, params = setup
        batch = synthetic_batch(empty_gt=True)
        total, losses = model.loss_fn(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(total))
        assert float(losses["loss_box_reg"]) == 0.0
        assert float(losses["loss_rpn_loc"]) == 0.0

    @pytest.mark.slow
    def test_inference_shapes(self, setup):
        cfg, model, params = setup
        batch = synthetic_batch()
        dets = model.inference_fn(params, batch)
        d = cfg.TEST.DETECTIONS_PER_IMAGE
        assert dets["boxes"].shape == (2, d, 4)
        assert dets["classes"].shape == (2, d)
        b = np.asarray(dets["boxes"])
        assert (b >= -1e-4).all()


class TestMaskKeypointRCNN:
    @pytest.mark.slow
    def test_mask_keypoint_train_and_infer(self):
        cfg = rcnn_cfg(mask_on=True, keypoint_on=True)
        model = build_model(cfg)
        params = model.init_params(jax.random.PRNGKey(0), image_size=(128, 128))
        batch = _with_masks_and_kpts(synthetic_batch())
        total, losses = model.loss_fn(params, batch, jax.random.PRNGKey(1))
        assert {"loss_mask", "loss_keypoint"} <= set(losses.keys())
        assert np.isfinite(float(total))
        dets = model.inference_fn(params, batch)
        assert "masks" in dets and "keypoints" in dets
        assert dets["masks"].shape[2:] == (28, 28)
        assert dets["keypoints"].shape[2:] == (17, 4)


class TestC4AndFocal:
    @pytest.mark.slow
    def test_res5_roi_heads(self):
        cfg = rcnn_cfg(c4=True)
        model = build_model(cfg)
        params = model.init_params(jax.random.PRNGKey(0), image_size=(128, 128))
        batch = synthetic_batch()
        total, losses = model.loss_fn(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(total))
        dets = model.inference_fn(params, batch)
        assert dets["boxes"].shape[0] == 2

    @pytest.mark.slow
    def test_faster_rcnn_focal_loss(self):
        cfg = rcnn_cfg(focal=True)
        model = build_model(cfg)
        assert model.roi_heads.use_focal_cls
        params = model.init_params(jax.random.PRNGKey(0), image_size=(128, 128))
        batch = synthetic_batch()
        total, losses = model.loss_fn(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(total))


class TestProposalNetwork:
    def test_rpn_only(self):
        cfg = rcnn_cfg()
        cfg.MODEL.META_ARCHITECTURE = "ProposalNetwork"
        model = build_model(cfg)
        params = model.init_params(jax.random.PRNGKey(0), image_size=(128, 128))
        batch = synthetic_batch()
        total, losses = model.loss_fn(params, batch, jax.random.PRNGKey(1))
        assert set(losses.keys()) == {"loss_rpn_cls", "loss_rpn_loc"}
        dets = model.inference_fn(params, batch)
        assert dets["boxes"].shape[1] == cfg.MODEL.RPN.POST_NMS_TOPK_TEST
