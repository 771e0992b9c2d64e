"""Gambler subsystem tests: layout round-trips (reference
ImbalanceDetection/tests/test_reshape.py spec), UNet shapes (test_unet.py),
gambler loss semantics, and one full G-step + D-step of the GAN trainer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from common import retinanet_cfg, synthetic_batch

from fsgd_tpu.config import add_gambler_config
from fsgd_tpu.gambler import (
    GANTrainer,
    LayeredUnetGambler,
    build_gambler,
    calc_cls_loss,
    calc_gambler_loss,
)
from fsgd_tpu.gambler.layouts import levels_to_NsumHWA_K, nhwc_to_N_HWA_K, NsumHWA_K_to_level_NHWAK
from fsgd_tpu.gambler.unet import UNet, LayeredUnet
from fsgd_tpu.models import build_model


def gambler_cfg(num_classes=8, anchors=9, image=(128, 128)):
    cfg = retinanet_cfg(num_classes=num_classes, image_bucket=image)
    add_gambler_config(cfg)
    g = cfg.MODEL.GAMBLER_HEAD
    g.NAME = "LayeredUnetGambler"
    g.GAMBLER_OUTPUT = "L_BAHW"
    g.NUM_CLASSES = num_classes
    g.GAMBLER_IN_CHANNELS = num_classes * anchors
    g.GAMBLER_OUT_CHANNELS = anchors
    g.IN_LAYERS = [image[0] // 8, image[0] // 16, image[0] // 32, image[0] // 64, image[0] // 128]
    g.GAMBLER_ITERATIONS = 1
    g.DETECTOR_ITERATIONS = 1
    g.VIS_PERIOD = 0
    return cfg


class TestLayouts:
    def test_roundtrip(self):
        """The reshape round-trip the fork tests in test_reshape.py."""
        rng = np.random.RandomState(0)
        b, a, k = 2, 3, 4
        levels = [jnp.asarray(rng.rand(b, h, w, a * k).astype(np.float32)) for h, w in [(8, 8), (4, 4), (2, 2)]]
        flat = levels_to_NsumHWA_K(levels, k)
        assert flat.shape == (b * (64 + 16 + 4) * a, k)
        back = NsumHWA_K_to_level_NHWAK(flat, b, [8, 4, 2], [8, 4, 2], a, k)
        for orig, rec in zip(levels, back):
            np.testing.assert_allclose(
                np.asarray(rec), np.asarray(orig).reshape(rec.shape), atol=0
            )

    def test_flat_order_matches_retinanet(self):
        """Gambler layout order must equal the detector's N_HWA_K order."""
        from fsgd_tpu.models.meta_arch.retinanet import permute_to_N_HWA_K

        x = jnp.arange(2 * 4 * 4 * 6, dtype=jnp.float32).reshape(2, 4, 4, 6)
        a = nhwc_to_N_HWA_K(x, 2)
        b = permute_to_N_HWA_K(x, 2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestUNets:
    @pytest.mark.slow
    def test_unet_shapes(self):
        """Reference ImbalanceDetection/tests/test_unet.py shape check."""
        net = UNet(out_channels=5)
        x = jnp.zeros((1, 32, 32, 7))
        params = net.init(jax.random.PRNGKey(0), x)["params"]
        y = net.apply({"params": params}, x)
        assert y.shape == (1, 32, 32, 5)
        assert float(jnp.min(y)) >= 0 and float(jnp.max(y)) <= 1  # sigmoid output

    @pytest.mark.slow
    def test_layered_unet_shapes(self):
        net = LayeredUnet(img_channels=3)
        sizes = [16, 8, 4, 2, 1]
        levels = [jnp.zeros((2, s, s, 32)) for s in sizes]
        img = jnp.zeros((2, 16, 16, 3))
        params = net.init(jax.random.PRNGKey(0), levels, img)["params"]
        outs = net.apply({"params": params}, levels, img)
        # [p7, p6, p5, p4, p3] with channels [1024, 512, 256, 128, 64]
        assert [o.shape[-1] for o in outs] == [1024, 512, 256, 128, 64]
        assert [o.shape[1] for o in outs] == [1, 2, 4, 8, 16]


class TestGamblerLoss:
    def test_calc_cls_loss_modes(self):
        pred = jnp.asarray([[2.0, -2.0]])
        tgt = jnp.asarray([[1.0, 0.0]])
        focal = calc_cls_loss(pred, tgt, "focal", alpha=0.25, gamma=2.0)
        sig = calc_cls_loss(pred, tgt, "sigmoid")
        assert focal.shape == sig.shape == (1, 2)
        assert float(focal.sum()) < float(sig.sum())  # focal downweights easy

    def test_calc_gambler_loss_normalization(self):
        """Normalized bets sum to ~1 per image across anchors+levels; the
        objective is the negative weighted loss."""
        rng = np.random.RandomState(0)
        n, a, k = 2, 3, 4
        hs, ws = [4, 2], [4, 2]
        r = sum(h * w * a for h, w in zip(hs, ws))
        valid_loss = jnp.asarray(rng.rand(n * r, k).astype(np.float32))
        bets = [jnp.asarray(rng.rand(n, h, w, a).astype(np.float32)) for h, w in zip(hs, ws)]
        loss, nakhw, w_flat = calc_gambler_loss(
            valid_loss, bets, n, hs, ws, a, k,
            gambler_output="L_BAHW", temperature=0.03, normalize_w=True, gamma=1.0,
        )
        w = np.asarray(w_flat).reshape(n, r)
        np.testing.assert_allclose(w.sum(axis=1), [1.0, 1.0], rtol=1e-5)
        assert float(loss) < 0  # -(w * positive loss)
        # diagnostics keep per-level class-aggregated losses
        assert [tuple(l.shape) for l in nakhw] == [(2, 4, 4, 3), (2, 2, 2, 3)]

    def test_higher_bets_on_loss_lower_objective(self):
        """Betting on high-loss anchors decreases the gambler objective."""
        n, a, k = 1, 1, 1
        hs, ws = [2], [2]
        loss_map = jnp.asarray([[10.0], [0.1], [0.1], [0.1]])
        bet_on_big = [jnp.asarray([[[[1.0]], [[0.0]]], [[[0.0]], [[0.0]]]]).reshape(1, 2, 2, 1)]
        bet_on_small = [jnp.ones((1, 2, 2, 1)) * 0.25]
        l1, _, _ = calc_gambler_loss(loss_map, bet_on_big, n, hs, ws, a, k, "L_BAHW", 0.03, True, 1.0)
        l2, _, _ = calc_gambler_loss(loss_map, bet_on_small, n, hs, ws, a, k, "L_BAHW", 0.03, True, 1.0)
        assert float(l1) < float(l2)


class TestGANTrainer:
    @pytest.mark.slow
    def test_g_and_d_steps(self):
        cfg = gambler_cfg()
        batch = synthetic_batch(batch=2, h=128, w=128)

        def loader():
            while True:
                yield batch

        trainer = GANTrainer(cfg, loader())
        from fsgd_tpu.utils.events import EventStorage

        gam_before = jax.tree_util.tree_leaves(trainer.gam_state.params)[0].copy()
        det_before = jax.tree_util.tree_leaves(trainer.det_state.params)[0].copy()
        det_params_before_tree = jax.tree.map(lambda x: x.copy(), trainer.det_state.params)

        with EventStorage() as storage:
            trainer.storage = storage
            trainer.run_step()  # G phase
            assert trainer.iter_G == 1
            gam_after = jax.tree_util.tree_leaves(trainer.gam_state.params)[0]
            assert not np.allclose(np.asarray(gam_before), np.asarray(gam_after))
            np.testing.assert_array_equal(
                np.asarray(det_before), np.asarray(jax.tree_util.tree_leaves(trainer.det_state.params)[0])
            )

            trainer.run_step()  # D phase (counters reset after the last D iter)
            assert trainer.iter_D == 0 and trainer.iter_G == 0
            # detector must have moved somewhere (first leaf may be frozen BN)
            diff = sum(
                float(jnp.sum(jnp.abs(a - b)))
                for a, b in zip(
                    jax.tree_util.tree_leaves(det_params_before_tree),
                    jax.tree_util.tree_leaves(trainer.det_state.params),
                )
            )
            assert diff > 0

            hist = storage.histories()
            assert "loss_gambler" in hist and "loss_detector" in hist
            assert "gambler_bets/mean" in hist


class TestUnetGambler:
    """Single-level UnetGambler path (reference gambler_heads.py:321-428)."""

    def _build(self, num_classes=4, anchors=1, image=256):
        cfg = gambler_cfg(num_classes=num_classes, anchors=anchors, image=(image, image))
        g = cfg.MODEL.GAMBLER_HEAD
        g.NAME = "UnetGambler"
        g.GAMBLER_OUTPUT = "B1HW"
        g.GAMBLER_IN_CHANNELS = 3 + num_classes * anchors
        g.GAMBLER_OUT_CHANNELS = 1
        from fsgd_tpu.gambler.gambler_heads import UnetGambler

        gam = UnetGambler(cfg)
        params = gam.init_params(jax.random.PRNGKey(0), (image, image))
        return gam, params

    @pytest.mark.slow
    def test_matching_grid(self):
        """Detector level at stride 16 == unet grid: no resize needed."""
        gam, params = self._build()
        rng = np.random.RandomState(0)
        logits = [jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32))]
        gt = jnp.asarray(rng.randint(0, 5, (2, 16 * 16)).astype(np.int32))
        images = jnp.asarray(rng.rand(2, 256, 256, 3).astype(np.float32) * 255)
        loss_dict, weights, betting = gam.forward(params, images, logits, gt)
        assert np.isfinite(float(loss_dict["gambler_loss"]))
        assert betting.shape == (2, 16, 16, 1)

    def test_grid_mismatch_resizes_bets(self):
        """Detector level at stride 8 (32x32) vs unet grid (16x16): the bets
        must be resized onto the logits grid; gt stays aligned to the logits
        (regression for the dead-ternary defect flagged in round 1)."""
        gam, params = self._build()
        rng = np.random.RandomState(1)
        logits = [jnp.asarray(rng.randn(2, 32, 32, 4).astype(np.float32))]
        gt = jnp.asarray(rng.randint(0, 5, (2, 32 * 32)).astype(np.int32))
        images = jnp.asarray(rng.rand(2, 256, 256, 3).astype(np.float32) * 255)
        loss_dict, weights, betting = gam.forward(params, images, logits, gt)
        assert np.isfinite(float(loss_dict["gambler_loss"]))
        # bets live on the logits grid after the resize
        assert betting.shape == (2, 32, 32, 1)
        assert np.isfinite(float(loss_dict["loss_before_weighting"]))
        # loss must respond to gt: all-background vs mixed labels differ
        gt_bg = jnp.full_like(gt, 4)
        loss_bg, _, _ = gam.forward(params, images, logits, gt_bg)
        assert float(loss_bg["loss_before_weighting"]) != float(loss_dict["loss_before_weighting"])
