"""TensorMask project e2e smoke test."""

import numpy as np
import pytest

import jax

from common import synthetic_batch
from test_rcnn import _with_masks_and_kpts

from fsgd_tpu.config import get_cfg
from fsgd_tpu.models import build_model
from fsgd_tpu.projects.tensormask import add_tensormask_config


@pytest.mark.slow
def test_tensormask_train_and_infer():
    cfg = get_cfg()
    add_tensormask_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "TensorMask"
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.TENSOR_MASK.NUM_CLASSES = 8
    cfg.MODEL.TENSOR_MASK.MASK_SIZE = 9
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16], [32], [64], [128], [256]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MAX_GT_PER_IMAGE = 10

    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0), image_size=(128, 128))
    batch = _with_masks_and_kpts(synthetic_batch())

    total, losses = model.loss_fn(params, batch)
    assert np.isfinite(float(total))
    assert {"loss_cls", "loss_box_reg", "loss_mask"} == set(losses.keys())

    grads = jax.grad(lambda p: model.loss_fn(p, batch)[0])(params)
    g = jax.tree_util.tree_leaves(grads["head"] if "head" in grads else grads)
    assert any(float(np.abs(np.asarray(x)).max()) > 0 for x in g)

    dets = model.inference_fn(params, batch)
    assert dets["masks"].shape[2:] == (9, 9)
    assert dets["boxes"].shape[0] == 2
