"""Gambler heads: betting-map networks + the gambler objective.

Parity with ImbalanceDetection/imbalancedetection/gambler_heads.py:17-647:
``calc_cls_loss`` (per-anchor focal/BCE, :104-128), ``calc_gambler_loss``
(layout-code aggregation, temperature + normalization of bets, objective
``-(w^gamma * loss).sum()``, :131-253), ``get_loss_upper_bound`` (:17-31),
``UnetGambler`` (:321-428), ``LayeredUnetGambler`` (:431-630, the main
variant: PreGamblerImage + shared PreGamblerPredictions + LayeredUnet over 5
FPN scales + per-level PostGamblerPredictions, picky-mask applied to bets)
and ``UnetLaurence`` (:632-647).

TPU design: every gambler is a *functional* orchestrator — linen modules +
pure jittable ``forward(params, ...)`` that returns ``(loss_dict, weights,
betting_map)``; no event-storage writes inside the compute path (diagnostics
are returned in the loss dict for the host-side trainer to log).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.registry import Registry
from .layouts import levels_to_NsumHWA_K, nhwc_to_N_HWA_K
from .pre_post import PostGamblerPredictions, PreGamblerImage, PreGamblerPredictions
from .unet import LayeredUnet, UNet, UnetGenerator

GAMBLER_HEAD_REGISTRY = Registry("GAMBLER_HEAD")


def build_gambler(cfg):
    """Reference imbalancedetection/build.py:31-39."""
    return GAMBLER_HEAD_REGISTRY.get(cfg.MODEL.GAMBLER_HEAD.NAME)(cfg)


def build_detector(cfg):
    """Reference imbalancedetection/build.py:20-28."""
    from ..models import build_model

    return build_model(cfg)


# --------------------------------------------------------------------------- #
# losses
# --------------------------------------------------------------------------- #


def calc_cls_loss(pred, gt_target, mode="focal", alpha=-1.0, gamma=2.0):
    """Elementwise per-anchor classification loss (focal or plain BCE)."""
    p = jax.nn.sigmoid(pred)
    ce = jnp.maximum(pred, 0) - pred * gt_target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    if mode == "focal":
        p_t = p * gt_target + (1 - p) * (1 - gt_target)
        loss = ce * (1 - p_t) ** gamma
        if alpha >= 0:
            alpha_t = alpha * gt_target + (1 - alpha) * (1 - gt_target)
            loss = alpha_t * loss
        return loss
    if mode == "sigmoid":
        return ce
    raise ValueError("gambler loss mode must be 'focal' or 'sigmoid'")


def _flatten_weights(
    weights_levels: Sequence[jnp.ndarray],
    k: int,
    temperature: float,
    normalize: bool,
    per_level_normalize: bool = False,
    extend_to_batch: bool = False,
) -> jnp.ndarray:
    """Temperature-shift + normalize bets, flatten to (B*sumHWA, K).

    Mirrors GamblerHeads.permute_all_weights_to_N_HWA_K_and_concat(_)
    (reference gambler_heads.py:260-318): the single-level variant normalizes
    each level by its own per-image sum; the layered variant by the sum across
    all levels (and across the batch for "extendtobatch").
    """
    flat = [nhwc_to_N_HWA_K(w, k) + temperature for w in weights_levels]
    if normalize:
        if per_level_normalize:
            flat = [w / jnp.sum(w, axis=(1, 2), keepdims=True) for w in flat]
        else:
            axes = (0, 1, 2) if extend_to_batch else (1, 2)
            denom = sum(jnp.sum(w, axis=axes, keepdims=True) for w in flat)
            flat = [w / denom for w in flat]
    return jnp.concatenate(flat, axis=1).reshape(-1, k)


def _split_loss_levels(valid_loss, n, hs, ws, a, k):
    """(B*R, K) -> list of (B, H, W, A, K)."""
    per_image = valid_loss.reshape(n, -1, k)
    out, start = [], 0
    for h, w in zip(hs, ws):
        size = h * w * a
        out.append(per_image[:, start : start + size, :].reshape(n, h, w, a, k))
        start += size
    return out


def calc_gambler_loss(
    valid_loss: jnp.ndarray,  # (B*R, K)
    weights,  # single map or list of per-level maps, NHWC
    n: int,
    hs: Sequence[int],
    ws: Sequence[int],
    num_anchors: int,
    num_classes: int,
    gambler_output: str,
    temperature: float,
    normalize_w: bool,
    gamma: float = 1.0,
):
    """Aggregate the per-anchor loss per the layout code, bet-weight it, and
    return (gambler_loss, NAKHW_loss diagnostics, flattened weights).

    Reference gambler_heads.py:131-253.
    """
    loss_levels = _split_loss_levels(valid_loss, n, hs, ws, num_anchors, num_classes)
    single = not gambler_output.startswith("L_")
    w_list = [weights] if single else list(weights)
    code = gambler_output[2:] if gambler_output.startswith("L_") else gambler_output
    extend = False
    if code == "BAHW_extendtobatch":
        code, extend = "BAHW", True

    if code == "B1HW":
        agg = [jnp.sum(l, axis=(3, 4))[..., None] for l in loss_levels]  # (B, H, W, 1)
        k = 1
    elif code == "BCHW":
        agg = [jnp.sum(l, axis=3) for l in loss_levels]  # (B, H, W, K)
        k = num_classes
    elif code == "BAHW":
        agg = [jnp.sum(l, axis=4) for l in loss_levels]  # (B, H, W, A)
        k = 1
    elif code == "BCAHW":
        agg = [l.reshape(l.shape[0], l.shape[1], l.shape[2], -1) for l in loss_levels]
        k = num_classes
    else:
        raise ValueError("unknown gambler output code: {}".format(gambler_output))

    nakhw_loss = [jax.lax.stop_gradient(l) for l in agg]
    loss_flat = jnp.concatenate(
        [a.reshape(a.shape[0], -1, k) for a in agg], axis=1
    ).reshape(-1, k)
    w_flat = _flatten_weights(
        w_list, k, temperature, normalize_w, per_level_normalize=single, extend_to_batch=extend
    )
    gambler_loss = jnp.sum(-(w_flat ** gamma) * loss_flat)
    return gambler_loss, nakhw_loss, w_flat


def get_loss_upper_bound(nakhw_loss, n, smoothing, kappa):
    """Diagnostic bound on the gambler objective (reference gambler_heads.py:17-31)."""
    per_level_max = [jnp.max(l.reshape(n, -1), axis=1) for l in nakhw_loss]
    max_loss = jnp.max(jnp.stack(per_level_max, axis=1), axis=1)  # (N,)
    r = sum(int(np.prod(l.shape[1:])) for l in nakhw_loss)
    w_max = (1 + smoothing) / (r * smoothing + 1)
    return kappa * w_max * n * jnp.sum(max_loss)


# --------------------------------------------------------------------------- #
# gambler models
# --------------------------------------------------------------------------- #


class GamblerBase:
    def __init__(self, cfg):
        self.cfg = cfg
        g = cfg.MODEL.GAMBLER_HEAD
        self.in_channels = g.GAMBLER_IN_CHANNELS
        self.out_channels = g.GAMBLER_OUT_CHANNELS
        self.bilinear = g.BILINEAR_UPSAMPLING
        self.mode = g.GAMBLER_LOSS_MODE
        self.alpha = cfg.MODEL.RETINANET.FOCAL_LOSS_ALPHA
        self.focal_gamma = cfg.MODEL.RETINANET.FOCAL_LOSS_GAMMA
        self.normalize_w = g.NORMALIZE
        self.gambler_output = g.GAMBLER_OUTPUT
        self.temperature = g.GAMBLER_TEMPERATURE
        self.gamma = g.GAMBLER_GAMMA
        self.num_classes = g.NUM_CLASSES
        self.data_range = list(g.DATA_RANGE)
        self.training = True

    def train(self, mode=True):
        self.training = mode
        return self

    def eval(self):
        return self.train(False)

    # shared target construction (valid/fg handling, reference :540-556)
    def _per_anchor_loss(self, logits_levels, gt_classes):
        k = self.num_classes
        flat_logits = levels_to_NsumHWA_K(logits_levels, k)  # (B*R, K)
        gt = gt_classes.reshape(-1)
        valid = gt >= 0
        fg = valid & (gt != k)
        target = jax.nn.one_hot(jnp.where(fg, gt, k), k + 1)[:, :k]
        cls_loss = calc_cls_loss(flat_logits, target, self.mode, self.alpha, self.focal_gamma)
        valid_loss = jnp.where(valid[:, None], cls_loss, 0.0)
        return valid_loss, jnp.sum(fg), gt.shape[0]


@GAMBLER_HEAD_REGISTRY.register()
class LayeredUnetGambler(GamblerBase):
    """The main gambler: layered U-Net over the five FPN prediction maps
    (reference gambler_heads.py:431-630)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        g = cfg.MODEL.GAMBLER_HEAD
        self.image_mode = g.IMAGE_MODE
        self.image_channels = g.IMAGE_CHANNELS
        self.fixed_channel = g.FIXED_CHANNEL
        self.in_layers = list(g.IN_LAYERS)
        prior_bias = 0.0
        if g.INIT == "default":
            prior_bias = -float(np.log((1 - g.PRIOR_PROB) / g.PRIOR_PROB))

        self.pre_image = PreGamblerImage(self.image_mode, self.image_channels)
        self.pre_pred = PreGamblerPredictions(self.fixed_channel, num_conv=1)
        self.unet = LayeredUnet(img_channels=self.image_channels)
        self.post = PostGamblerPredictions(self.out_channels, prior_bias=prior_bias)

    def init_params(self, rng, image_hw: Tuple[int, int], batch: int = 1):
        """Initialize with dummy inputs at the given padded input size."""
        h, w = image_hw
        strides = (8, 16, 32, 64, 128)[: len(self.in_layers)]
        hs = [max(h // s, 1) for s in strides]
        ws = [max(w // s, 1) for s in strides]
        dummy_levels = [
            jnp.zeros((batch, hh, www, self.in_channels), jnp.float32) for hh, www in zip(hs, ws)
        ]
        dummy_img = jnp.zeros((batch, h, w, 3), jnp.float32)
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        params = {}
        params["pre_image"] = self.pre_image.init(r1, dummy_img).get("params", {})
        params["pre_pred"] = self.pre_pred.init(r2, dummy_levels)["params"]
        pre_out = self.pre_pred.apply({"params": params["pre_pred"]}, dummy_levels)
        im = self.pre_image.apply({"params": params["pre_image"]}, dummy_img)
        params["unet"] = self.unet.init(r3, pre_out, im if self.image_channels else None)["params"]
        unet_out = self.unet.apply({"params": params["unet"]}, pre_out, im if self.image_channels else None)
        params["post"] = self.post.init(r4, unet_out)["params"]
        return params

    def preprocess_input(self, logits_levels, images):
        """Sigmoid + DATA_RANGE scaling (reference :604-630, multi-layer mode)."""
        if self.data_range == [-0.5, 0.5]:
            scaled = [jax.nn.sigmoid(p) - 0.5 for p in logits_levels]
        elif self.data_range == [-128, 128]:
            scaled = [(jax.nn.sigmoid(p) - 0.5) * 256 for p in logits_levels]
        else:
            scaled = [jax.nn.sigmoid(p) for p in logits_levels]
        return scaled, images

    def forward(self, params, images, logits_levels, gt_classes, mask, detach_pred=True):
        """
        Args:
            images: (B, H, W, 3) normalized input images.
            logits_levels: per-level (B, Hi, Wi, A*K) class logits.
            gt_classes: (B, R) anchor labels (K = bg, -1 = ignore).
            mask: (B, R) picky binary quality mask.
            detach_pred: stop gradients into the detector (G-phase).

        Returns: (loss_dict, weights_flat, betting_map list)
        """
        if detach_pred:
            logits_levels = [jax.lax.stop_gradient(p) for p in logits_levels]

        scaled, images = self.preprocess_input(logits_levels, images)
        im = (
            self.pre_image.apply({"params": params["pre_image"]}, images)
            if self.image_channels
            else None
        )
        pre = self.pre_pred.apply({"params": params["pre_pred"]}, scaled)
        decoder = self.unet.apply({"params": params["unet"]}, pre, im)
        betting_map = self.post.apply({"params": params["post"]}, decoder)  # [p3..p7]
        # the reference masks the bets IN PLACE inside gambler_loss
        # (gambler_heads.py:566-572), so its returned betting_map is the
        # masked one — mirror that for trainer metrics/visualization parity
        n = logits_levels[0].shape[0]
        hs = [int(p.shape[1]) for p in logits_levels]
        ws = [int(p.shape[2]) for p in logits_levels]
        a = logits_levels[0].shape[3] // self.num_classes
        masked_bets = self._mask_bets(betting_map, mask, n, hs, ws, a)

        loss_dict, weights = self.gambler_loss(
            logits_levels, masked_bets, gt_classes, mask, detach_pred, bets_pre_masked=True
        )
        return loss_dict, weights, masked_bets

    __call__ = forward

    def _mask_bets(self, betting_map, mask, n, hs, ws, a):
        """Picky quality-mask applied to the bets (reference :560-572)."""
        mask_levels = _split_loss_levels(mask.reshape(-1, 1).astype(jnp.float32), n, hs, ws, a, 1)
        return [
            w * m[..., 0] if w.shape[-1] == a else w * jnp.max(m[..., 0], axis=3, keepdims=True)
            for w, m in zip(betting_map, mask_levels)
        ]

    def gambler_loss(self, logits_levels, betting_map, gt_classes, mask, detach_pred,
                     bets_pre_masked=False):
        assert self.gambler_output in ("L_BAHW", "L_B1HW", "L_BAHW_extendtobatch"), (
            "layered gambler supports L_BAHW / L_B1HW / L_BAHW_extendtobatch"
        )
        n = logits_levels[0].shape[0]
        hs = [int(p.shape[1]) for p in logits_levels]
        ws = [int(p.shape[2]) for p in logits_levels]
        a = logits_levels[0].shape[3] // self.num_classes

        valid_loss, num_fg, num_all = self._per_anchor_loss(logits_levels, gt_classes)

        masked_bets = (
            betting_map if bets_pre_masked else self._mask_bets(betting_map, mask, n, hs, ws, a)
        )

        gambler_loss, nakhw_loss, weights = calc_gambler_loss(
            valid_loss,
            masked_bets,
            n,
            hs,
            ws,
            a,
            self.num_classes,
            self.gambler_output,
            self.temperature,
            self.normalize_w,
            self.gamma,
        )

        loss_sum = sum(jnp.sum(l) for l in nakhw_loss)
        if self.mode == "focal":
            loss_before_weighting = loss_sum / jnp.maximum(num_fg, 1)
        else:
            loss_before_weighting = loss_sum / num_all

        g = self.cfg.MODEL.GAMBLER_HEAD
        loss_dict = {
            "NAKHW_loss": nakhw_loss,
            "loss_before_weighting": loss_before_weighting,
            "gambler_loss": gambler_loss,
            "loss_gambler/lower_bound": -get_loss_upper_bound(
                nakhw_loss, n, g.GAMBLER_TEMPERATURE, g.GAMBLER_KAPPA
            ),
        }
        return loss_dict, jax.lax.stop_gradient(weights)


@GAMBLER_HEAD_REGISTRY.register()
class UnetGambler(GamblerBase):
    """Plain U-Net on (downsampled image (+) sigmoid logits) for single-level
    detectors (reference gambler_heads.py:321-428)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.unet = UNet(self.out_channels, bilinear=self.bilinear)

    def init_params(self, rng, image_hw: Tuple[int, int], batch: int = 1, level_channels: int = None):
        h, w = image_hw
        c = self.in_channels
        dummy = jnp.zeros((batch, max(h // 16, 16), max(w // 16, 16), c), jnp.float32)
        return {"unet": self.unet.init(rng, dummy)["params"]}

    def preprocess_input(self, logits_levels, images):
        """Single-level mode: stride-16 image downsample + scaled sigmoid
        (reference :615-630)."""
        from .unet import torch_bilinear_downsample

        n, h, w, c = images.shape
        im = torch_bilinear_downsample(images, 16)  # F.interpolate parity
        sig = jax.nn.sigmoid(logits_levels[0])
        if self.data_range == [-0.5, 0.5]:
            scaled = sig - 0.5
            im = im / 256.0
        elif self.data_range == [-128, 128]:
            scaled = (sig - 0.5) * 256
        else:
            scaled = sig
        sig = jax.image.resize(scaled, (n, im.shape[1], im.shape[2], scaled.shape[-1]), method="bilinear")
        return jnp.concatenate([im, sig], axis=-1), im

    def forward(self, params, images, logits_levels, gt_classes, mask=None, detach_pred=True):
        if detach_pred:
            logits_levels = [jax.lax.stop_gradient(p) for p in logits_levels]
        gambler_in, _ = self.preprocess_input(logits_levels, images)
        weights_map = self.unet.apply({"params": params["unet"]}, gambler_in)

        n = logits_levels[0].shape[0]
        hs = [int(logits_levels[0].shape[1])]
        ws = [int(logits_levels[0].shape[2])]
        a = logits_levels[0].shape[3] // self.num_classes

        # The per-anchor loss must stay on the logits' native grid, where
        # gt_classes (N, H*W*A) is aligned (reference gambler_heads.py:346-386
        # assumes the U-Net bets share that grid).  When the U-Net output grid
        # differs (stride-16 input vs a different-stride detector level),
        # resize the *bets* onto the logits grid instead of the logits.
        if tuple(weights_map.shape[1:3]) != (hs[0], ws[0]):
            weights_map = jax.image.resize(
                weights_map,
                (n, hs[0], ws[0], weights_map.shape[3]),
                method="bilinear",
            )
        valid_loss, num_fg, num_all = self._per_anchor_loss(logits_levels, gt_classes)
        gambler_loss, nakhw_loss, weights = calc_gambler_loss(
            valid_loss,
            weights_map,
            n,
            hs,
            ws,
            a,
            self.num_classes,
            self.gambler_output,
            self.temperature,
            self.normalize_w,
            self.gamma,
        )
        loss_sum = sum(jnp.sum(l) for l in nakhw_loss)
        loss_before = loss_sum / jnp.maximum(num_fg, 1)
        loss_dict = {
            "NAKHW_loss": nakhw_loss,
            "loss_before_weighting": loss_before,
            "gambler_loss": gambler_loss,
        }
        return loss_dict, jax.lax.stop_gradient(weights), weights_map

    __call__ = forward


@GAMBLER_HEAD_REGISTRY.register()
class UnetLaurence(GamblerBase):
    """pix2pix-generator gambler (reference gambler_heads.py:632-647)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.unet = UnetGenerator(self.out_channels, num_downs=5, ngf=64, kernel_size=3)

    def init_params(self, rng, image_hw: Tuple[int, int], batch: int = 1):
        h, w = image_hw
        dummy = jnp.zeros((batch, max(h // 16, 32), max(w // 16, 32), self.in_channels), jnp.float32)
        return {"unet": self.unet.init(rng, dummy)["params"]}

    def forward(self, params, gambler_input):
        return self.unet.apply({"params": params["unet"]}, gambler_input)

    __call__ = forward
