"""TensorMask config extension (parity with
projects/TensorMask/tensormask/config.py)."""

from fsgd_tpu.config import CfgNode as CN


def add_tensormask_config(cfg):
    _C = cfg
    _C.MODEL.TENSOR_MASK = CN()
    _C.MODEL.TENSOR_MASK.NUM_CLASSES = 80
    _C.MODEL.TENSOR_MASK.IN_FEATURES = ["p3", "p4", "p5", "p6", "p7"]
    _C.MODEL.TENSOR_MASK.NUM_CONVS = 4
    _C.MODEL.TENSOR_MASK.IOU_THRESHOLDS = [0.3, 0.5]
    _C.MODEL.TENSOR_MASK.IOU_LABELS = [0, -1, 1]
    _C.MODEL.TENSOR_MASK.PRIOR_PROB = 0.01
    _C.MODEL.TENSOR_MASK.SCORE_THRESH_TEST = 0.05
    _C.MODEL.TENSOR_MASK.TOPK_CANDIDATES_TEST = 6000
    _C.MODEL.TENSOR_MASK.NMS_THRESH_TEST = 0.5
    _C.MODEL.TENSOR_MASK.BBOX_REG_WEIGHTS = (1.5, 1.5, 0.75, 0.75)
    _C.MODEL.TENSOR_MASK.FOCAL_LOSS_GAMMA = 3.0
    _C.MODEL.TENSOR_MASK.FOCAL_LOSS_ALPHA = 0.3
    # mask window unit length (masks are MASK_SIZE x MASK_SIZE per location)
    _C.MODEL.TENSOR_MASK.MASK_SIZE = 15
    _C.MODEL.TENSOR_MASK.MASK_LOSS_WEIGHT = 2.0
    # align representation + swap_align2nat lambda
    _C.MODEL.TENSOR_MASK.ALIGNED_ON = True
    _C.MODEL.TENSOR_MASK.BIPYRAMID_ON = False  # round-1 scope: base pyramid
    return cfg
