"""Every shipped config family must build a model (registry/key coverage)."""

import numpy as np
import pytest

import jax

from fsgd_tpu.config import add_gambler_config, get_cfg
from fsgd_tpu.models import build_model

CONFIGS = [
    "configs/COCO-Detection/faster_rcnn_R_50_FPN_1x.yaml",
    "configs/COCO-Detection/faster_rcnn_R_50_C4_1x.yaml",
    "configs/COCO-Detection/retinanet_R_50_FPN_1x.yaml",
    "configs/COCO-Detection/rpn_R_50_FPN_1x.yaml",
    "configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml",
    "configs/COCO-Keypoints/keypoint_rcnn_R_50_FPN_1x.yaml",
    "configs/COCO-PanopticSegmentation/panoptic_fpn_R_50_1x.yaml",
    "configs/LVIS-ImbalanceDetection/faster_rcnn_R_50_FPN_1x_fasterrcnn_focalloss.yaml",
]


@pytest.mark.parametrize("path", CONFIGS)
def test_config_builds_model(path):
    import os

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..", path))
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    assert model is not None


def test_tensormask_config_builds():
    import os

    from fsgd_tpu.projects.tensormask import add_tensormask_config

    cfg = get_cfg()
    add_tensormask_config(cfg)
    cfg.merge_from_file(
        os.path.join(
            os.path.dirname(__file__), "..", "projects/TensorMask/configs/tensormask_R_50_FPN_1x.yaml"
        )
    )
    cfg.MODEL.WEIGHTS = ""
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    assert model.bipyramid_on and model.aligned_on
    assert model.mask_sizes == [11, 15] and model.num_anchors == 2
    assert model.min_anchor_size == 40.0


def test_gambler_config_builds():
    import os

    from fsgd_tpu.gambler import build_gambler

    cfg = get_cfg()
    add_gambler_config(cfg)
    cfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs/ImbalanceDetection/Base-Gambler.yaml")
    )
    cfg.TPU.COMPUTE_DTYPE = "float32"
    gambler = build_gambler(cfg)
    detector = build_model(cfg)
    assert gambler is not None and detector is not None
