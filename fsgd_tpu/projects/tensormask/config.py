"""TensorMask config extension (parity with
projects/TensorMask/tensormask/config.py:7-50, plus TPU static-shape knobs)."""

from fsgd_tpu.config import CfgNode as CN


def add_tensormask_config(cfg):
    _C = cfg
    _C.MODEL.TENSOR_MASK = CN()
    _C.MODEL.TENSOR_MASK.NUM_CLASSES = 80
    _C.MODEL.TENSOR_MASK.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6", "p7"]
    _C.MODEL.TENSOR_MASK.NUM_CONVS = 4
    _C.MODEL.TENSOR_MASK.PRIOR_PROB = 0.01
    _C.MODEL.TENSOR_MASK.CLS_CHANNELS = 256
    _C.MODEL.TENSOR_MASK.BBOX_CHANNELS = 128
    _C.MODEL.TENSOR_MASK.MASK_CHANNELS = 128
    _C.MODEL.TENSOR_MASK.SCORE_THRESH_TEST = 0.05
    _C.MODEL.TENSOR_MASK.TOPK_CANDIDATES_TEST = 6000
    _C.MODEL.TENSOR_MASK.NMS_THRESH_TEST = 0.5
    _C.MODEL.TENSOR_MASK.BBOX_REG_WEIGHTS = (1.5, 1.5, 0.75, 0.75)
    _C.MODEL.TENSOR_MASK.FOCAL_LOSS_GAMMA = 3.0
    _C.MODEL.TENSOR_MASK.FOCAL_LOSS_ALPHA = 0.3
    _C.MODEL.TENSOR_MASK.MASK_LOSS_WEIGHT = 2.0
    _C.MODEL.TENSOR_MASK.POSITIVE_WEIGHT = 1.5
    # aligned representation (SwapAlign2Nat) + bipyramid refinement
    _C.MODEL.TENSOR_MASK.ALIGNED_ON = True
    _C.MODEL.TENSOR_MASK.BIPYRAMID_ON = False
    # -- TPU static-shape knobs (no reference equivalent; see arch.py docstring)
    # top-K foreground windows trained per (level, anchor) pair per image;
    # broadcast of the last entry covers deeper pyramids
    _C.MODEL.TENSOR_MASK.TRAIN_MASKS_PER_LEVEL = [128, 64, 32, 16, 8, 8]
    # native windows above this size are BCE-sampled on a subsampled canvas
    _C.MODEL.TENSOR_MASK.TRAIN_CANVAS_MAX = 64
    # fixed canvas the natural window is sampled onto at inference
    _C.MODEL.TENSOR_MASK.TEST_CANVAS_SIZE = 32
    return cfg
