"""DensePose project e2e smoke test."""

import numpy as np
import pytest

import jax

from common import synthetic_batch
from test_rcnn import rcnn_cfg

from fsgd_tpu.models import build_model
from fsgd_tpu.projects.densepose import add_densepose_config


def _with_densepose(batch, heatmap=56, max_pts=20):
    b, g = batch["gt_classes"].shape
    rng = np.random.RandomState(0)
    pts = np.zeros((b, g, max_pts, 4), np.float32)
    uv = np.zeros((b, g, max_pts, 2), np.float32)
    valid = np.zeros((b, g, max_pts), bool)
    segm = np.zeros((b, g, heatmap, heatmap), np.int32)
    for i in range(b):
        for j in range(g):
            if batch["gt_valid"][i, j]:
                x1, y1, x2, y2 = batch["gt_boxes"][i, j]
                n = 8
                pts[i, j, :n, 0] = rng.uniform(x1, x2, n)
                pts[i, j, :n, 1] = rng.uniform(y1, y2, n)
                pts[i, j, :n, 2] = rng.randint(1, 25, n)
                uv[i, j, :n] = rng.rand(n, 2)
                valid[i, j, :n] = True
                segm[i, j, 10:40, 10:40] = rng.randint(1, 15)
    out = dict(batch)
    out.update(dp_points=pts, dp_uv=uv, dp_valid=valid, dp_segm=segm)
    return out


@pytest.mark.slow
def test_densepose_train_and_infer():
    cfg = rcnn_cfg(num_classes=1)
    add_densepose_config(cfg)
    cfg.MODEL.ROI_HEADS.NAME = "DensePoseROIHeads"
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS = 2
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM = 64
    cfg.MODEL.ROI_DENSEPOSE_HEAD.HEATMAP_SIZE = 56
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0), image_size=(128, 128))
    batch = _with_densepose(synthetic_batch(num_classes=1))
    total, losses = model.loss_fn(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(total))
    assert {"loss_densepose_S", "loss_densepose_I", "loss_densepose_U", "loss_densepose_V"} <= set(losses)

    dets = model.inference_fn(params, batch)
    assert "densepose" in dets
    assert dets["densepose"].shape[2:] == (56, 56, 4)
