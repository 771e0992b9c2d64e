"""Rotated detection pipeline test: RRPN + RROIHeads Faster R-CNN variant."""

import numpy as np
import pytest

import jax

from fsgd_tpu.config import get_cfg
from fsgd_tpu.models import build_model


def rotated_cfg(num_classes=5):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "RRPN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.NAME = "RotatedAnchorGenerator"
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.MODEL.ANCHOR_GENERATOR.ANGLES = [[-30, 0, 30]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.BBOX_REG_WEIGHTS = (1.0, 1.0, 1.0, 1.0, 1.0)
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 200
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 50
    cfg.MODEL.ROI_HEADS.NAME = "RROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = num_classes
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_BOX_HEAD.NAME = "FastRCNNConvFCHead"
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 256
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE = "ROIAlignRotated"
    cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0, 1.0)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MAX_GT_PER_IMAGE = 6
    return cfg


def rotated_batch(batch=2, h=128, w=128, max_gt=6, num_classes=5, seed=0):
    rng = np.random.RandomState(seed)
    gt_boxes = np.zeros((batch, max_gt, 5), np.float32)
    gt_classes = np.zeros((batch, max_gt), np.int32)
    gt_valid = np.zeros((batch, max_gt), bool)
    for b in range(batch):
        n = 3
        gt_boxes[b, :n, 0:2] = rng.rand(n, 2) * (w * 0.5) + w * 0.25
        gt_boxes[b, :n, 2:4] = rng.rand(n, 2) * 30 + 10
        gt_boxes[b, :n, 4] = rng.rand(n) * 90 - 45
        gt_classes[b, :n] = rng.randint(0, num_classes, n)
        gt_valid[b, :n] = True
    return {
        "image": rng.rand(batch, h, w, 3).astype(np.float32) * 255,
        "image_size": np.tile(np.array([[h, w]], np.int32), (batch, 1)),
        "out_size": np.tile(np.array([[h, w]], np.int32), (batch, 1)),
        "gt_boxes": gt_boxes,
        "gt_classes": gt_classes,
        "gt_valid": gt_valid,
    }


@pytest.mark.slow
def test_rotated_faster_rcnn_train_and_infer():
    cfg = rotated_cfg()
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0), image_size=(128, 128))
    batch = rotated_batch()
    total, losses = model.loss_fn(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(total))
    assert set(losses.keys()) == {"loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"}

    dets = model.inference_fn(params, batch)
    assert dets["boxes"].shape[-1] == 5
    assert dets["boxes"].shape[0] == 2
