"""End-to-end RetinaNet model tests (modeled on reference tests/test_model_e2e.py:41-96:
train/eval on random images, including empty ground truth, with backprop)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from common import retinanet_cfg, synthetic_batch

from fsgd_tpu.models import build_model


@pytest.fixture(scope="module")
def model_and_params():
    cfg = retinanet_cfg()
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0), image_size=(128, 128))
    return cfg, model, params


class TestRetinaNet:
    def test_build(self, model_and_params):
        cfg, model, params = model_and_params
        assert model.num_anchors == 9
        assert model.feature_strides == [8, 16, 32, 64, 128]

    def test_anchor_counts(self, model_and_params):
        cfg, model, params = model_and_params
        anchors = model.anchors_for(128, 128)
        # levels: 16x16, 8x8, 4x4, 2x2, 1x1 grids x 9 anchors
        expected = [16 * 16 * 9, 8 * 8 * 9, 4 * 4 * 9, 2 * 2 * 9, 1 * 1 * 9]
        assert [len(a) for a in anchors] == expected

    @pytest.mark.slow
    def test_loss_and_grad(self, model_and_params):
        cfg, model, params = model_and_params
        batch = synthetic_batch()
        (total, losses), grads = jax.value_and_grad(model.loss_fn, has_aux=True)(params, batch)
        assert np.isfinite(float(total))
        assert set(losses.keys()) == {"loss_cls", "loss_box_reg"}
        # frozen stem must get zero grads (FREEZE_AT=2)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        stem_grads = [np.abs(np.asarray(v)).max() for k, v in flat if "stem" in jax.tree_util.keystr(k)]
        assert stem_grads and max(stem_grads) == 0.0
        head_grads = [np.abs(np.asarray(v)).max() for k, v in flat if "cls_score" in jax.tree_util.keystr(k)]
        assert head_grads and max(head_grads) > 0.0

    def test_empty_gt(self, model_and_params):
        """Training on images with no GT must produce finite losses
        (reference test_model_e2e.py trains on empty annotations)."""
        cfg, model, params = model_and_params
        batch = synthetic_batch(empty_gt=True)
        total, losses = model.loss_fn(params, batch)
        assert np.isfinite(float(total))
        assert float(losses["loss_box_reg"]) == 0.0

    def test_forward_train_contract(self, model_and_params):
        """The fork's 5-tuple contract for the gambler (retinanet.py:141-146)."""
        cfg, model, params = model_and_params
        batch = synthetic_batch()
        images, preds, gt_classes, mask, losses = model.forward_train(params, batch)
        r = sum(len(a) for a in model.anchors_for(128, 128))
        assert images.shape == (2, 128, 128, 3)
        assert preds["pred_class_logits"].shape == (2, r, 8)
        assert preds["pred_proposal_deltas"].shape == (2, r, 4)
        assert gt_classes.shape == (2, r)
        assert mask.shape == (2, r)
        assert set(np.unique(np.asarray(mask))).issubset({0, 1})
        # every valid GT rescues at least one anchor -> some foreground exists
        fg = (np.asarray(gt_classes) >= 0) & (np.asarray(gt_classes) != 8)
        assert fg.sum() > 0
        # picky mask is a subset of (or equal to) plausible foreground anchors
        assert np.asarray(mask).sum() >= 1

    @pytest.mark.slow
    def test_inference(self, model_and_params):
        cfg, model, params = model_and_params
        batch = synthetic_batch()
        images, raw_preds, dets = model.inference_fn(params, batch)
        d = cfg.TEST.DETECTIONS_PER_IMAGE
        assert dets["boxes"].shape == (2, d, 4)
        assert dets["scores"].shape == (2, d)
        assert dets["valid"].shape == (2, d)
        # boxes are clipped to the output canvas
        b = np.asarray(dets["boxes"])
        assert (b >= -1e-4).all() and (b[..., 0::2] <= 128 + 1e-4).all()

    @pytest.mark.slow
    def test_call_eval_api(self, model_and_params):
        """detectron2-style list-of-dicts eval path returns the fork 4-tuple."""
        cfg, model, params = model_and_params
        model.params = params
        model.eval()
        inputs = [{"image": np.random.rand(100, 120, 3).astype(np.float32) * 255, "height": 200, "width": 240}]
        images, raw_preds, none, processed = model(inputs)
        assert none is None
        assert len(processed) == 1
        inst = processed[0]["instances"]
        assert inst.image_size == (200, 240)
        model.train()
