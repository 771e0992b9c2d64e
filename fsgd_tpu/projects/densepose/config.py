"""DensePose config extension (parity with projects/DensePose/densepose/config.py:15-35)."""

from fsgd_tpu.config import CfgNode as CN


def add_densepose_config(cfg):
    _C = cfg
    _C.MODEL.DENSEPOSE_ON = True
    _C.MODEL.ROI_DENSEPOSE_HEAD = CN()
    _C.MODEL.ROI_DENSEPOSE_HEAD.NAME = "DensePoseV1ConvXHead"
    _C.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS = 8
    # 24 surface patches + background
    _C.MODEL.ROI_DENSEPOSE_HEAD.NUM_PATCHES = 24
    _C.MODEL.ROI_DENSEPOSE_HEAD.DECONV_KERNEL = 4
    _C.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM = 512
    _C.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_KERNEL = 3
    _C.MODEL.ROI_DENSEPOSE_HEAD.UP_SCALE = 2
    _C.MODEL.ROI_DENSEPOSE_HEAD.HEATMAP_SIZE = 56
    _C.MODEL.ROI_DENSEPOSE_HEAD.POOLER_TYPE = "ROIAlignV2"
    _C.MODEL.ROI_DENSEPOSE_HEAD.POOLER_RESOLUTION = 14
    _C.MODEL.ROI_DENSEPOSE_HEAD.POOLER_SAMPLING_RATIO = 2
    _C.MODEL.ROI_DENSEPOSE_HEAD.FG_IOU_THRESHOLD = 0.7
    # loss weights: coarse segmentation / part index / UV point regression
    _C.MODEL.ROI_DENSEPOSE_HEAD.INDEX_WEIGHTS = 2.0
    _C.MODEL.ROI_DENSEPOSE_HEAD.PART_WEIGHTS = 0.3
    _C.MODEL.ROI_DENSEPOSE_HEAD.POINT_REGRESSION_WEIGHTS = 0.1
    # TPU static-shape contract: annotated points are padded to this length
    # per instance (COCO-DensePose annotates at most ~184 points/person)
    _C.MODEL.ROI_DENSEPOSE_HEAD.MAX_POINTS = 196
    return cfg
