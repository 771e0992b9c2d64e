"""TensorMask — dense sliding-window instance segmentation.

Parity target: projects/TensorMask/tensormask/arch.py (the ``TensorMask``
meta-arch: assignment rule :28-119, anchor generator :215-283, meta-arch
:286-744, head :747-904) with the SwapAlign2Nat op from
fsgd_tpu/ops/swap_align2nat.py.

TPU-first redesign notes
------------------------
* The reference materializes the full *natural* mask tensor per level and
  anchor — ``(N, (2^l*m)^2, H_l, W_l)`` — which is ~m^2*H0*W0 floats PER
  LEVEL (about 0.5 GB/image for the R50 model).  Here the head only ever
  produces the *aligned* representation (``(B, H, W, m^2)``, the conv
  output itself); natural windows are gathered **sparsely** with
  ``swap_align2nat_at``/``swap_align2nat_window`` at the ~K foreground
  anchors (training) or the ~D final detections (inference).  This is
  exact for windows that fit the canvas and point-sampled above it.
* Training selects a fixed top-K foreground set per (level, anchor) pair
  (``TRAIN_MASKS_PER_LEVEL``) so every shape is static; the reference
  trains on all foreground anchors (arch.py:578-600).  K decays with level
  because upper-level windows are quadratically larger and upper-level
  foregrounds quadratically rarer.
* Mask BCE above ``TRAIN_CANVAS_MAX`` native size is evaluated on a
  subsampled canvas; with the reference's 1/size^2 weighting this is a
  mean over window cells, for which canvas sampling is an unbiased
  estimate on the smooth sigmoid windows.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fsgd_tpu.models.batching import batched_inputs_to_batch  # noqa: F401
from fsgd_tpu.models.build import META_ARCH_REGISTRY, build_anchor_generator, build_backbone
from fsgd_tpu.models.meta_arch.detector_base import DetectorBase
from fsgd_tpu.models.meta_arch.retinanet import permute_to_N_HWA_K
from fsgd_tpu.ops.box_transform import Box2BoxTransform
from fsgd_tpu.ops.losses import sigmoid_cross_entropy, sigmoid_focal_loss_star, smooth_l1_loss
from fsgd_tpu.ops.nms import batched_nms_mask
from fsgd_tpu.ops.swap_align2nat import swap_align2nat_window
from fsgd_tpu.models.roi_heads.mask_head import crop_gt_masks_batched


def assignment_rule(
    gt_boxes: jnp.ndarray,  # (G, 4)
    gt_valid: jnp.ndarray,  # (G,) bool
    anchor_boxes: jnp.ndarray,  # (R, 4)
    unit_lengths: jnp.ndarray,  # (R,)
    min_anchor_size: float,
    scale_thresh: float = 2.0,
    spatial_thresh: float = 1.0,
    uniqueness_on: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TensorMask's containment + centrality assignment
    (reference arch.py:28-119, paper arXiv:1903.12174).

    Returns (matches (R,) int32 gt index, fg (R,) bool).  Padded GT rows
    (``gt_valid`` False) can never match.  With ``uniqueness_on`` anchors
    matching multiple GTs become background, so no ignore label exists.
    """
    # Containment: the anchor box must fully contain the gt box.
    lt_ok = jnp.all(gt_boxes[:, None, :2] >= anchor_boxes[None, :, :2], axis=2)
    rb_ok = jnp.all(gt_boxes[:, None, 2:] <= anchor_boxes[None, :, 2:], axis=2)
    contain = lt_ok & rb_ok  # (G, R)

    # Scale: anchor (minus one sampling stride) no bigger than 2x gt size.
    gt_size = jnp.max(gt_boxes[:, 2:] - gt_boxes[:, :2], axis=1)  # (G,)
    gt_upper = jnp.maximum(gt_size * scale_thresh, min_anchor_size)
    anchor_size = jnp.max(anchor_boxes[:, 2:] - anchor_boxes[:, :2], axis=1) - unit_lengths
    scale_ok = (gt_upper[:, None] - anchor_size[None, :]) >= 0  # (G, R)

    # Spatial: gt center within one unit length of the anchor center.
    gt_c = (gt_boxes[:, 2:] + gt_boxes[:, :2]) / 2.0
    an_c = (anchor_boxes[:, 2:] + anchor_boxes[:, :2]) / 2.0
    off = (gt_c[:, None, :] - an_c[None, :, :]) / unit_lengths[None, :, None]
    spatial_ok = jnp.sum(off * off, axis=2) <= spatial_thresh * spatial_thresh

    assert uniqueness_on, "uniqueness_off (ignore label) is not used by any config"
    assign = contain & scale_ok & spatial_ok & gt_valid[:, None]  # (G, R)
    matched = jnp.any(assign, axis=0)
    matches = jnp.argmax(assign, axis=0).astype(jnp.int32)
    fg = matched & (jnp.sum(assign, axis=0) <= 1)
    return matches, fg


class TensorMaskHead(nn.Module):
    """Cls / box / mask subnets (reference arch.py:747-904).

    Mask predictors are 1x1 convs shared across pyramid levels, one per
    window size.  With ``bipyramid_on`` the per-level mask features are
    bilinearly upsampled to the finest grid, fused with the finest level
    through one shared 3x3 conv (reference arch.py:875-887), and the
    aligned window logits are predicted on that grid for every level.
    """

    num_classes: int
    num_anchors: int
    num_convs: int
    cls_channels: int
    bbox_channels: int
    mask_channels: int
    mask_sizes: Sequence[int]
    prior_prob: float
    mask_on: bool
    bipyramid_on: bool
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        conv_kw = dict(
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        cls_tower = [nn.Conv(self.cls_channels, name=f"cls_subnet{i}", **conv_kw) for i in range(self.num_convs)]
        bias_init = nn.initializers.constant(-math.log((1.0 - self.prior_prob) / self.prior_prob))
        cls_score = nn.Conv(
            self.num_anchors * self.num_classes, name="cls_score", bias_init=bias_init, **conv_kw
        )
        bbox_tower = [nn.Conv(self.bbox_channels, name=f"bbox_subnet{i}", **conv_kw) for i in range(self.num_convs)]
        bbox_pred = nn.Conv(self.num_anchors * 4, name="bbox_pred", **conv_kw)

        logits, deltas = [], []
        for f in feats:
            c, b = f, f
            for conv in cls_tower:
                c = nn.relu(conv(c))
            for conv in bbox_tower:
                b = nn.relu(conv(b))
            logits.append(cls_score(c).astype(jnp.float32))
            deltas.append(bbox_pred(b).astype(jnp.float32))

        if not self.mask_on:
            return logits, deltas, None

        mask_tower = [nn.Conv(self.mask_channels, name=f"mask_subnet{i}", **conv_kw) for i in range(self.num_convs)]
        mask_feats = []
        for f in feats:
            m = f
            for conv in mask_tower:
                m = nn.relu(conv(m))
            mask_feats.append(m)

        if self.bipyramid_on:
            fuse = nn.Conv(self.mask_channels, name="mask_fuse", **conv_kw)
            base = mask_feats[0]
            h0, w0 = base.shape[1], base.shape[2]
            fused = []
            for lvl, mf in enumerate(mask_feats):
                lam = 2 ** lvl
                if lvl > 0:
                    b_, h, w, ch = mf.shape
                    mf = jax.image.resize(mf, (b_, h * lam, w * lam, ch), method="bilinear")
                    mf = mf[:, :h0, :w0]
                fused.append(nn.relu(fuse(mf + base)))
            mask_feats = fused

        pred_kw = dict(
            kernel_size=(1, 1),
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        mask_preds = {
            m: nn.Conv(m * m, name=f"mask_pred_{m:02d}", **pred_kw)
            for m in sorted(set(int(s) for s in self.mask_sizes))
        }
        # aligned representation only: (B, Hsrc, Wsrc, m^2) per level per anchor
        pred_masks = [
            [mask_preds[int(m)](mf).astype(jnp.float32) for m in self.mask_sizes]
            for mf in mask_feats
        ]
        return logits, deltas, pred_masks


class TensorMaskModule(nn.Module):
    backbone: Any
    in_features: Sequence[str]
    head: TensorMaskHead
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        feats_dict = self.backbone(images.astype(self.dtype))
        feats = [feats_dict[f] for f in self.in_features]
        return self.head(feats)


@META_ARCH_REGISTRY.register()
class TensorMask(DetectorBase):
    """TensorMask meta-arch (reference arch.py:286-744)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        tm = cfg.MODEL.TENSOR_MASK
        self.num_classes = tm.NUM_CLASSES
        self.in_features = list(tm.IN_FEATURES)
        self.num_levels = len(self.in_features)
        self.focal_loss_alpha = tm.FOCAL_LOSS_ALPHA
        self.focal_loss_gamma = tm.FOCAL_LOSS_GAMMA
        self.score_threshold = tm.SCORE_THRESH_TEST
        self.topk_candidates = tm.TOPK_CANDIDATES_TEST
        self.nms_threshold = tm.NMS_THRESH_TEST
        self.max_detections_per_image = cfg.TEST.DETECTIONS_PER_IMAGE
        self.mask_on = cfg.MODEL.MASK_ON
        self.mask_loss_weight = tm.MASK_LOSS_WEIGHT
        self.mask_pos_weight = tm.POSITIVE_WEIGHT
        self.aligned_on = tm.ALIGNED_ON
        self.bipyramid_on = tm.BIPYRAMID_ON
        assert self.aligned_on or not self.bipyramid_on, "BIPYRAMID_ON requires ALIGNED_ON"

        backbone = build_backbone(cfg)
        shapes = backbone.output_shape()
        feature_shapes = [shapes[f] for f in self.in_features]
        self.feature_strides = [s.stride for s in feature_shapes]
        self.anchor_generator = build_anchor_generator(cfg, feature_shapes)
        num_cell = self.anchor_generator.num_cell_anchors
        assert len(set(num_cell)) == 1
        self.num_anchors = num_cell[0]

        # window sizes from the finest level's anchor sizes (reference arch.py:328-330)
        sizes0 = list(cfg.MODEL.ANCHOR_GENERATOR.SIZES[0])
        assert len(sizes0) == self.num_anchors
        self.mask_sizes = [int(s) // self.feature_strides[0] for s in sizes0]
        self.min_anchor_size = float(min(sizes0) - self.feature_strides[0])

        # TPU static-shape knobs (see module docstring)
        per_lvl = list(tm.TRAIN_MASKS_PER_LEVEL)
        if len(per_lvl) < self.num_levels:
            per_lvl = per_lvl + [per_lvl[-1]] * (self.num_levels - len(per_lvl))
        self.train_masks_per_level = per_lvl[: self.num_levels]
        self.train_canvas_max = int(tm.TRAIN_CANVAS_MAX)
        self.test_canvas = int(tm.TEST_CANVAS_SIZE)

        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        head = TensorMaskHead(
            num_classes=self.num_classes,
            num_anchors=self.num_anchors,
            num_convs=tm.NUM_CONVS,
            cls_channels=tm.CLS_CHANNELS,
            bbox_channels=tm.BBOX_CHANNELS,
            mask_channels=tm.MASK_CHANNELS,
            mask_sizes=tuple(self.mask_sizes),
            prior_prob=tm.PRIOR_PROB,
            mask_on=self.mask_on,
            bipyramid_on=self.bipyramid_on,
            dtype=dtype,
            name="head",
        )
        self.module = TensorMaskModule(
            backbone=backbone, in_features=self.in_features, head=head, dtype=dtype
        )
        self.box2box_transform = Box2BoxTransform(weights=tm.BBOX_REG_WEIGHTS)
        self.mask_gt_stride = cfg.TPU.GT_MASK_STRIDE

    # -- static per-resolution layout ---------------------------------------
    def _layout(self, h: int, w: int):
        """Per-level grid sizes, anchors, unit lengths and flat offsets."""
        grids = [
            (int(math.ceil(h / s)), int(math.ceil(w / s))) for s in self.feature_strides
        ]
        anchors = self.anchor_generator(grids)  # list of Boxes (Hl*Wl*A, 4)
        units = [
            jnp.full((g[0] * g[1] * self.num_anchors,), float(s), jnp.float32)
            for g, s in zip(grids, self.feature_strides)
        ]
        counts = [g[0] * g[1] * self.num_anchors for g in grids]
        offsets = np.concatenate([[0], np.cumsum(counts)])
        return grids, anchors, units, offsets

    def get_ground_truth(self, anchors_cat, units_cat, batch):
        """Vectorized assignment (reference arch.py:494-621) over the batch."""

        def per_image(gt_boxes, gt_classes_in, gt_valid):
            matches, fg = assignment_rule(
                gt_boxes, gt_valid, anchors_cat, units_cat, self.min_anchor_size
            )
            classes = jnp.where(fg, gt_classes_in[matches], self.num_classes)
            deltas = self.box2box_transform.get_deltas(anchors_cat, gt_boxes[matches])
            return classes.astype(jnp.int32), deltas, matches, fg

        return jax.vmap(per_image)(batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"])

    # -- training -------------------------------------------------------------
    def loss_fn(self, params, batch, rng=None):
        images = self.normalize(batch["image"])
        box_cls, box_delta, pred_masks = self.module.apply({"params": params}, images)
        h, w = batch["image"].shape[1:3]
        grids, anchors, units, offsets = self._layout(h, w)
        anchors_cat = jnp.concatenate([a.tensor for a in anchors], axis=0)
        units_cat = jnp.concatenate(units, axis=0)

        gt_classes, gt_deltas, matches, fg = self.get_ground_truth(anchors_cat, units_cat, batch)
        gt_classes = jax.lax.stop_gradient(gt_classes)
        gt_deltas = jax.lax.stop_gradient(gt_deltas)
        fg = jax.lax.stop_gradient(fg)

        a = self.num_anchors
        logits = jnp.concatenate(
            [permute_to_N_HWA_K(t, self.num_classes) for t in box_cls], axis=1
        )  # (B, R, K)
        deltas = jnp.concatenate([permute_to_N_HWA_K(t, 4) for t in box_delta], axis=1)

        b, r = gt_classes.shape
        flat_fg = fg.reshape(-1)
        num_fg = jnp.maximum(jnp.sum(flat_fg), 1).astype(jnp.float32)
        target = jax.nn.one_hot(
            jnp.where(flat_fg, gt_classes.reshape(-1), self.num_classes),
            self.num_classes,
            dtype=logits.dtype,
        )
        cls_el = sigmoid_focal_loss_star(
            logits.reshape(-1, self.num_classes), target,
            self.focal_loss_alpha, self.focal_loss_gamma,
        )
        loss_cls = jnp.sum(cls_el) / num_fg
        reg_el = smooth_l1_loss(deltas.reshape(-1, 4), gt_deltas.reshape(-1, 4), beta=0.0)
        loss_box_reg = jnp.sum(jnp.where(flat_fg[:, None], reg_el, 0.0)) / num_fg

        losses = {"loss_cls": loss_cls, "loss_box_reg": loss_box_reg}
        if not (self.mask_on and "gt_masks" in batch and pred_masks is not None):
            return sum(losses.values()), losses

        # -- mask loss: sparse natural-window gathers per (level, anchor) -----
        loss_mask = 0.0
        for lvl in range(self.num_levels):
            lam = 2 ** lvl if self.bipyramid_on else 1
            hl, wl = grids[lvl]
            off = int(offsets[lvl])
            k_sel = min(self.train_masks_per_level[lvl], hl * wl)
            fg_lvl = fg[:, off: int(offsets[lvl + 1])].reshape(b, hl * wl, a)
            match_lvl = matches[:, off: int(offsets[lvl + 1])].reshape(b, hl * wl, a)
            for anc in range(a):
                m = self.mask_sizes[anc]
                native = lam * m
                cvs = min(native, self.train_canvas_max)
                fg_fa = fg_lvl[:, :, anc]  # (B, Hl*Wl)
                score = fg_fa.astype(jnp.float32) - jnp.arange(hl * wl) * 1e-9
                _, sel = jax.lax.top_k(score, k_sel)  # (B, K)
                sel_valid = jnp.take_along_axis(fg_fa, sel, axis=1)
                ys = sel // wl
                xs = sel % wl

                src = pred_masks[lvl][anc]  # (B, Hsrc, Wsrc, m^2) aligned
                if self.aligned_on:
                    windows = jax.vmap(
                        lambda s_, p_: swap_align2nat_window(s_, p_, lam, cvs)
                    )(src, jnp.stack([ys, xs], axis=-1))  # (B, K, cvs, cvs)
                else:
                    flat = jax.vmap(
                        lambda s_, yy, xx: s_[yy, xx].reshape(k_sel, m, m)
                    )(src, ys, xs)
                    windows = flat if cvs == m else jax.image.resize(
                        flat, (b, k_sel, cvs, cvs), method="bilinear"
                    )

                # matched GT mask cropped at the ANCHOR box (reference arch.py:589-596)
                flat_r = off + (sel * a + anc)
                anchor_boxes = anchors_cat[flat_r]  # (B, K, 4)
                gidx = jnp.take_along_axis(match_lvl[:, :, anc], sel, axis=1)
                crops = crop_gt_masks_batched(
                    batch["gt_masks"], gidx, anchor_boxes, self.mask_gt_stride, cvs
                )
                el = sigmoid_cross_entropy(
                    windows, (crops >= 0.5).astype(jnp.float32), pos_weight=self.mask_pos_weight
                )
                per_win = jnp.sum(el, axis=(2, 3)) / float(cvs * cvs)  # mean over window
                loss_mask = loss_mask + jnp.sum(jnp.where(sel_valid, per_win, 0.0))

        losses["loss_mask"] = loss_mask * self.mask_loss_weight / num_fg
        return sum(losses.values()), losses

    # -- inference --------------------------------------------------------------
    def inference_fn(self, params, batch):
        images = self.normalize(batch["image"])
        box_cls, box_delta, pred_masks = self.module.apply({"params": params}, images)
        h, w = batch["image"].shape[1:3]
        grids, anchors, units, offsets = self._layout(h, w)
        a = self.num_anchors
        k = self.num_classes

        cls_l = [permute_to_N_HWA_K(t, k) for t in box_cls]
        reg_l = [permute_to_N_HWA_K(t, 4) for t in box_delta]

        def single_image(cls_levels, reg_levels):
            boxes_all, scores_all, classes_all, valid_all = [], [], [], []
            lvl_all, ys_all, xs_all, anc_all, abox_all = [], [], [], [], []
            for lvl, (cls_i, reg_i) in enumerate(zip(cls_levels, reg_levels)):
                hl, wl = grids[lvl]
                scores = jax.nn.sigmoid(cls_i).reshape(-1)
                kk = min(max(self.topk_candidates // self.num_levels, 1), scores.shape[0])
                top_scores, top_idx = jax.lax.top_k(scores, kk)
                anchor_idx = top_idx // k
                boxes_all.append(
                    self.box2box_transform.apply_deltas(
                        reg_i[anchor_idx], anchors[lvl].tensor[anchor_idx]
                    )
                )
                scores_all.append(top_scores)
                classes_all.append(top_idx % k)
                valid_all.append(top_scores > self.score_threshold)
                lvl_all.append(jnp.full((kk,), lvl, jnp.int32))
                ys_all.append((anchor_idx // a) // wl)
                xs_all.append((anchor_idx // a) % wl)
                anc_all.append(anchor_idx % a)
                abox_all.append(anchors[lvl].tensor[anchor_idx])
            boxes = jnp.concatenate(boxes_all, 0)
            scores = jnp.concatenate(scores_all, 0)
            classes = jnp.concatenate(classes_all, 0)
            valid = jnp.concatenate(valid_all, 0)
            keep = batched_nms_mask(boxes, scores, classes, self.nms_threshold, valid)
            kept = jnp.where(keep, scores, -jnp.inf)
            d = min(self.max_detections_per_image, kept.shape[0])
            top_scores, idx = jax.lax.top_k(kept, d)
            det_valid = top_scores > -jnp.inf
            out = {
                "boxes": boxes[idx],
                "scores": jnp.where(det_valid, top_scores, 0.0),
                "classes": classes[idx],
                "valid": det_valid,
            }
            sel = {
                "lvl": jnp.concatenate(lvl_all, 0)[idx],
                "ys": jnp.concatenate(ys_all, 0)[idx],
                "xs": jnp.concatenate(xs_all, 0)[idx],
                "anc": jnp.concatenate(anc_all, 0)[idx],
                "abox": jnp.concatenate(abox_all, 0)[idx],
            }
            return out, sel

        dets, sel = jax.vmap(single_image)(cls_l, reg_l)

        if self.mask_on and pred_masks is not None:
            cvs = self.test_canvas
            d = dets["boxes"].shape[1]
            b = dets["boxes"].shape[0]
            masks = jnp.zeros((b, d, cvs, cvs), jnp.float32)
            # windows live in distinct (level, anchor) tensors; gather the
            # canvas window from every pair and select by provenance.
            for lvl in range(self.num_levels):
                lam = 2 ** lvl if self.bipyramid_on else 1
                for anc in range(a):
                    m = self.mask_sizes[anc]
                    src = pred_masks[lvl][anc]
                    pos = jnp.stack([sel["ys"], sel["xs"]], axis=-1)
                    if self.aligned_on:
                        win = jax.vmap(
                            lambda s_, p_: swap_align2nat_window(s_, p_, lam, cvs)
                        )(src, pos)
                    else:
                        flat = jax.vmap(lambda s_, yy, xx: s_[yy, xx])(src, sel["ys"], sel["xs"])
                        win = jax.image.resize(
                            flat.reshape(b, d, m, m), (b, d, cvs, cvs), method="bilinear"
                        )
                    here = (sel["lvl"] == lvl) & (sel["anc"] == anc)
                    masks = jnp.where(here[..., None, None], win, masks)
            dets["masks"] = jax.nn.sigmoid(masks)
            # masks are defined on the ANCHOR box, not the regressed box
            # (reference arch.py:700-731 pastes at result_anchors)
            dets["mask_boxes"] = sel["abox"]

        from fsgd_tpu.models.postprocessing import scale_detections

        return scale_detections(dets, batch["image_size"], batch["out_size"])

    # -- detectron2-style host API -------------------------------------------
    def __call__(self, batched_inputs: List[Dict]):
        from fsgd_tpu.models.meta_arch.rcnn import detections_to_instances

        batch = {k: jnp.asarray(v) for k, v in self.prepare_batch(batched_inputs).items()}
        params = self.params
        if self.training:
            fwd = self._jitted("loss", self.loss_fn)
            total, losses = fwd(params, batch)
            return losses
        fwd = self._jitted("inference", self.inference_fn)
        dets = fwd(params, batch)
        return detections_to_instances(dets, batch)
