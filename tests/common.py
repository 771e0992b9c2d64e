"""Shared test helpers: tiny configs and synthetic batches."""

import numpy as np

from fsgd_tpu.config import get_cfg


def retinanet_cfg(num_classes=8, image_bucket=(128, 128)):
    """A small RetinaNet R-50-FPN config (mirrors configs/Base-RetinaNet
    semantics with per-level anchor sizes)."""
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RetinaNet"
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RETINANET.NUM_CLASSES = num_classes
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[x, x * 2 ** (1.0 / 3), x * 2 ** (2.0 / 3)] for x in [32, 64, 128, 256, 512]]
    cfg.TPU.COMPUTE_DTYPE = "float32"  # CPU tests
    cfg.TPU.IMAGE_BUCKETS = [list(image_bucket)]
    cfg.TPU.MAX_GT_PER_IMAGE = 10
    return cfg


def synthetic_batch(batch=2, h=128, w=128, max_gt=10, num_classes=8, seed=0, empty_gt=False):
    rng = np.random.RandomState(seed)
    image = rng.rand(batch, h, w, 3).astype(np.float32) * 255
    gt_boxes = np.zeros((batch, max_gt, 4), np.float32)
    gt_classes = np.zeros((batch, max_gt), np.int32)
    gt_valid = np.zeros((batch, max_gt), bool)
    if not empty_gt:
        for b in range(batch):
            n = rng.randint(1, 5)
            xy = rng.rand(n, 2) * (w * 0.6)
            wh = rng.rand(n, 2) * (w * 0.3) + 8
            gt_boxes[b, :n] = np.concatenate([xy, xy + wh], axis=1)
            gt_classes[b, :n] = rng.randint(0, num_classes, n)
            gt_valid[b, :n] = True
    return {
        "image": image,
        "image_size": np.tile(np.array([[h, w]], np.int32), (batch, 1)),
        "out_size": np.tile(np.array([[h, w]], np.int32), (batch, 1)),
        "gt_boxes": gt_boxes,
        "gt_classes": gt_classes,
        "gt_valid": gt_valid,
    }
