"""Tests for TridentConv, SwapAlign2Nat, TTA, model zoo config resolution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestTridentConv:
    def test_weight_shared_dilations(self):
        from fsgd_tpu.projects.tridentnet import TridentConv

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32))
        conv = TridentConv(8, 3, dilations=(1, 2, 3))
        params = conv.init(jax.random.PRNGKey(0), [x, x, x])["params"]
        outs = conv.apply({"params": params}, [x, x, x])
        assert len(outs) == 3
        for o in outs:
            assert o.shape == (1, 16, 16, 8)
        # same input, different dilations -> different outputs, shared weight
        assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]))
        assert set(params.keys()) == {"kernel"}

    @pytest.mark.slow
    def test_trident_block_concat(self):
        from fsgd_tpu.projects.tridentnet import TridentBottleneckBlock

        x = jnp.zeros((2, 8, 8, 16))
        block = TridentBottleneckBlock(
            in_channels=16, out_channels=32, bottleneck_channels=8, concat_output=True, norm=""
        )
        params = block.init(jax.random.PRNGKey(0), x)["params"]
        out = block.apply({"params": params}, x)
        assert out.shape == (6, 8, 8, 32)  # 3 branches into batch


class TestSwapAlign2Nat:
    def test_identity_center_channel(self):
        """The center window cell has zero offset: its channel is unchanged."""
        from fsgd_tpu.ops import swap_align2nat

        rng = np.random.RandomState(0)
        u = 3
        x = jnp.asarray(rng.rand(1, 8, 8, u * u).astype(np.float32))
        out = swap_align2nat(x, lambda_val=1.0, pad_val=-6.0)
        center = (u * u) // 2
        np.testing.assert_allclose(np.asarray(out[..., center]), np.asarray(x[..., center]), atol=1e-6)

    def test_shift_semantics(self):
        """Channel (0, 0) reads from (y - lambda, x - lambda)."""
        from fsgd_tpu.ops import swap_align2nat

        x = np.zeros((1, 6, 6, 9), np.float32)
        x[0, 2, 2, 0] = 5.0
        out = np.asarray(swap_align2nat(jnp.asarray(x), lambda_val=1.0, pad_val=0.0))
        # out[y, x, 0] = in[y - 1, x - 1, 0] -> peak moves to (3, 3)
        assert out[0, 3, 3, 0] == pytest.approx(5.0)
        assert out[0, 2, 2, 0] == pytest.approx(0.0)

    def test_pad_val(self):
        from fsgd_tpu.ops import swap_align2nat

        x = jnp.zeros((1, 4, 4, 9), jnp.float32)
        out = np.asarray(swap_align2nat(x, lambda_val=2.0, pad_val=-6.0))
        assert out[0, 0, 0, 0] == pytest.approx(-6.0)  # reads outside

    @pytest.mark.parametrize("lam", [1, 2])
    def test_sparse_at_matches_dense(self, lam):
        """swap_align2nat_at rows == rows of the dense output."""
        from fsgd_tpu.ops.swap_align2nat import swap_align2nat, swap_align2nat_at

        rng = np.random.RandomState(1)
        u = 3
        x = jnp.asarray(rng.randn(1, 8, 8, u * u).astype(np.float32))
        dense = np.asarray(swap_align2nat(x, lambda_val=lam, pad_val=-6.0))
        hout, wout = dense.shape[1:3]
        uout = lam * u
        pos = np.array([[0, 0], [1, 2], [hout - 1, wout - 1]], np.int32)
        sparse = np.asarray(swap_align2nat_at(x[0], jnp.asarray(pos), lam, pad_val=-6.0))
        for i, (y, xx) in enumerate(pos):
            np.testing.assert_allclose(
                sparse[i].reshape(-1), dense[0, y, xx], rtol=1e-5, atol=1e-5
            )

    @pytest.mark.parametrize("lam", [1, 2])
    def test_window_canvas_matches_at_when_exact(self, lam):
        """canvas == native size -> swap_align2nat_window is exact."""
        from fsgd_tpu.ops.swap_align2nat import swap_align2nat_at, swap_align2nat_window

        rng = np.random.RandomState(2)
        u = 3
        x = jnp.asarray(rng.randn(8, 8, u * u).astype(np.float32))
        pos = jnp.asarray(np.array([[1, 1], [3, 2]], np.int32))
        native = lam * u
        at = np.asarray(swap_align2nat_at(x, pos, lam, pad_val=-6.0))
        win = np.asarray(swap_align2nat_window(x, pos, lam, canvas=native, pad_val=-6.0))
        np.testing.assert_allclose(win, at, rtol=1e-5, atol=1e-5)


class TestTTA:
    def test_mapper_tta_variants(self):
        from fsgd_tpu.config import get_cfg
        from fsgd_tpu.models.test_time_augmentation import DatasetMapperTTA

        cfg = get_cfg()
        cfg.TEST.AUG.MIN_SIZES = (32, 64)
        cfg.TEST.AUG.FLIP = True
        mapper = DatasetMapperTTA(cfg)
        dic = {"image": np.zeros((48, 96, 3), np.float32), "height": 48, "width": 96}
        variants = mapper(dic)
        assert len(variants) == 4  # 2 scales x (no-flip, flip)
        shapes = {v["image"].shape for v in variants}
        assert len(shapes) == 2

    @pytest.mark.slow
    def test_rcnn_with_tta_merges(self):
        from common import retinanet_cfg, synthetic_batch
        from fsgd_tpu.models import build_model
        from fsgd_tpu.models.test_time_augmentation import GeneralizedRCNNWithTTA

        cfg = retinanet_cfg()
        cfg.TEST.AUG.MIN_SIZES = (128,)
        cfg.TEST.AUG.FLIP = True
        model = build_model(cfg)
        model.params = model.init_params(jax.random.PRNGKey(0), image_size=(128, 128))
        model.eval()
        tta = GeneralizedRCNNWithTTA(cfg, model)
        out = tta([{"image": np.random.rand(128, 128, 3).astype(np.float32) * 255, "height": 128, "width": 128}])
        assert "instances" in out[0]


class TestModelZoo:
    def test_config_resolution(self):
        from fsgd_tpu import model_zoo

        path = model_zoo.get_config_file("COCO-Detection/faster_rcnn_R_50_FPN_1x.yaml")
        import os

        assert os.path.exists(path)
        url = model_zoo.get_checkpoint_url("COCO-Detection/faster_rcnn_R_50_FPN_1x.yaml")
        assert "model_final" in url
        with pytest.raises(RuntimeError):
            model_zoo.get_checkpoint_url("nonexistent.yaml")


@pytest.mark.slow
class TestTridentRCNN:
    @pytest.mark.slow
    def test_trident_train_and_infer(self):
        from common import synthetic_batch
        from fsgd_tpu.config import get_cfg
        from fsgd_tpu.models import build_model
        from fsgd_tpu.projects.tridentnet import add_tridentnet_config

        cfg = get_cfg()
        add_tridentnet_config(cfg)
        cfg.MODEL.META_ARCHITECTURE = "TridentRCNN"
        cfg.MODEL.BACKBONE.NAME = "build_trident_resnet_backbone"
        cfg.MODEL.ROI_HEADS.NAME = "Res5ROIHeads"
        cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
        cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
        cfg.MODEL.RPN.IN_FEATURES = ["res4"]
        cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 100
        cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 50
        cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 50
        cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 20
        cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.TPU.MAX_GT_PER_IMAGE = 6

        import jax
        import numpy as np

        model = build_model(cfg)
        params = model.init_params(jax.random.PRNGKey(0), image_size=(64, 64))
        batch = synthetic_batch(batch=2, h=64, w=64, max_gt=6, num_classes=4)
        total, losses = model.loss_fn(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(total))
        dets = model.inference_fn(params, batch)
        assert dets["boxes"].shape[0] == 2  # merged back to the true batch
