"""TensorMask project tests: assignment-rule semantics + e2e smoke for the
base pyramid and the bipyramid refinement (reference
projects/TensorMask/tensormask/arch.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from common import synthetic_batch
from test_rcnn import _with_masks_and_kpts

from fsgd_tpu.config import get_cfg
from fsgd_tpu.models import build_model
from fsgd_tpu.projects.tensormask import add_tensormask_config
from fsgd_tpu.projects.tensormask.arch import assignment_rule


def _np_assignment(gt, anchors, units, min_size, scale_t=2.0, spatial_t=1.0):
    """Literal numpy transcription of reference arch.py:28-119 semantics."""
    n, m = gt.shape[0], anchors.shape[0]
    contain = np.zeros((n, m), bool)
    for i in range(n):
        for j in range(m):
            contain[i, j] = (
                gt[i, 0] >= anchors[j, 0]
                and gt[i, 1] >= anchors[j, 1]
                and gt[i, 2] <= anchors[j, 2]
                and gt[i, 3] <= anchors[j, 3]
            )
    gt_size = np.maximum(gt[:, 2] - gt[:, 0], gt[:, 3] - gt[:, 1])
    upper = np.maximum(gt_size * scale_t, min_size)
    a_size = np.maximum(anchors[:, 2] - anchors[:, 0], anchors[:, 3] - anchors[:, 1]) - units
    scale_ok = upper[:, None] - a_size[None, :] >= 0
    gc = (gt[:, 2:] + gt[:, :2]) / 2
    ac = (anchors[:, 2:] + anchors[:, :2]) / 2
    off = (gc[:, None, :] - ac[None, :, :]) / units[None, :, None]
    spatial_ok = (off ** 2).sum(-1) <= spatial_t ** 2
    assign = contain & scale_ok & spatial_ok
    matched = assign.any(0)
    matches = assign.argmax(0)
    fg = matched & (assign.sum(0) <= 1)
    return matches, fg


def test_assignment_rule_matches_reference_semantics():
    rng = np.random.RandomState(3)
    anchors = []
    units = []
    for stride, size in [(8, 64), (16, 128)]:
        for y in range(0, 128, stride):
            for x in range(0, 128, stride):
                anchors.append([x - size / 2, y - size / 2, x + size / 2, y + size / 2])
                units.append(stride)
    anchors = np.array(anchors, np.float32)
    units = np.array(units, np.float32)
    gt = []
    for _ in range(6):
        xy = rng.rand(2) * 90
        wh = rng.rand(2) * 40 + 6
        gt.append([xy[0], xy[1], xy[0] + wh[0], xy[1] + wh[1]])
    gt = np.array(gt, np.float32)

    want_m, want_fg = _np_assignment(gt, anchors, units, min_size=56.0)
    got_m, got_fg = assignment_rule(
        jnp.asarray(gt), jnp.ones((6,), bool), jnp.asarray(anchors), jnp.asarray(units), 56.0
    )
    np.testing.assert_array_equal(np.asarray(got_fg), want_fg)
    np.testing.assert_array_equal(np.asarray(got_m)[want_fg], want_m[want_fg])

    # padded gt rows never match
    gt_valid = np.ones((6,), bool)
    gt_valid[3:] = False
    _, fg2 = assignment_rule(
        jnp.asarray(gt), jnp.asarray(gt_valid), jnp.asarray(anchors), jnp.asarray(units), 56.0
    )
    m2, f2 = _np_assignment(gt[:3], anchors, units, min_size=56.0)
    np.testing.assert_array_equal(np.asarray(fg2), f2)


def _tm_cfg(bipyramid=False):
    cfg = get_cfg()
    add_tensormask_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "TensorMask"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.TENSOR_MASK.IN_FEATURES = ["p3", "p4", "p5", "p6", "p7"]
    cfg.MODEL.TENSOR_MASK.NUM_CLASSES = 8
    cfg.MODEL.TENSOR_MASK.NUM_CONVS = 2
    cfg.MODEL.TENSOR_MASK.CLS_CHANNELS = 32
    cfg.MODEL.TENSOR_MASK.BBOX_CHANNELS = 32
    cfg.MODEL.TENSOR_MASK.MASK_CHANNELS = 32
    cfg.MODEL.TENSOR_MASK.BIPYRAMID_ON = bipyramid
    cfg.MODEL.TENSOR_MASK.TRAIN_MASKS_PER_LEVEL = [8, 4, 4, 4, 4]
    cfg.MODEL.TENSOR_MASK.TEST_CANVAS_SIZE = 16
    cfg.MODEL.TENSOR_MASK.TRAIN_CANVAS_MAX = 24
    # window size 72/8 = 9 at the finest level; synthetic gts (8..46 px)
    # land on p3 under the containment+scale rule
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[72], [144], [288], [576], [1152]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MAX_GT_PER_IMAGE = 10
    return cfg


@pytest.mark.slow
@pytest.mark.parametrize("bipyramid", [False, True])
def test_tensormask_train_and_infer(bipyramid):
    cfg = _tm_cfg(bipyramid)
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0), image_size=(128, 128))
    batch = _with_masks_and_kpts(synthetic_batch())

    total, losses = model.loss_fn(params, batch)
    assert np.isfinite(float(total))
    assert {"loss_cls", "loss_box_reg", "loss_mask"} == set(losses.keys())
    assert float(losses["loss_mask"]) > 0

    grads = jax.grad(lambda p: model.loss_fn(p, batch)[0])(params)
    g = jax.tree_util.tree_leaves(grads["head"] if "head" in grads else grads)
    assert any(float(np.abs(np.asarray(x)).max()) > 0 for x in g)
    # the mask branch must receive gradient through the sparse window gathers
    mask_g = [
        v for k, v in jax.tree_util.tree_flatten_with_path(grads)[0]
        if "mask" in "/".join(str(p) for p in k)
    ]
    assert any(float(np.abs(np.asarray(x)).max()) > 0 for x in mask_g)

    dets = model.inference_fn(params, batch)
    canvas = cfg.MODEL.TENSOR_MASK.TEST_CANVAS_SIZE
    assert dets["masks"].shape[2:] == (canvas, canvas)
    assert dets["mask_boxes"].shape == dets["boxes"].shape
    assert dets["boxes"].shape[0] == 2
