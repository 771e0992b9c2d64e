"""DensePoseROIHeads: StandardROIHeads + the densepose branch.

Parity target: projects/DensePose/densepose/roi_head.py:20-120 — pools fg
proposals at 14x14, runs the V1ConvX head + predictor, applies the
densepose losses (train) or attaches IUV results (inference).

Batch contract additions (padded static shapes):
    "dp_points" (B, G, P, 4): annotated points x, y, patch index, pad
    "dp_uv"     (B, G, P, 2): gt U/V
    "dp_valid"  (B, G, P)
    "dp_segm"   (B, G, S, S): per-instance coarse segmentation at heatmap res
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from fsgd_tpu.models.build import ROI_HEADS_REGISTRY
from fsgd_tpu.models.poolers import ROIPooler
from fsgd_tpu.models.roi_heads.roi_heads import StandardROIHeads, _select_fg

from .densepose_head import (
    DensePosePredictor,
    DensePoseV1ConvXHead,
    densepose_inference,
    densepose_losses,
)


@ROI_HEADS_REGISTRY.register()
class DensePoseROIHeads(StandardROIHeads):
    def __init__(self, cfg, input_shapes):
        super().__init__(cfg, input_shapes)
        dp = cfg.MODEL.ROI_DENSEPOSE_HEAD
        self.densepose_on = cfg.MODEL.get("DENSEPOSE_ON", True)
        shapes = [input_shapes[f] for f in self.in_features]
        scales = [1.0 / s.stride for s in shapes]
        self.dp_pooler = ROIPooler(dp.POOLER_RESOLUTION, scales, dp.POOLER_SAMPLING_RATIO, dp.POOLER_TYPE)
        self.dp_head_module = DensePoseV1ConvXHead(
            num_convs=dp.NUM_STACKED_CONVS, conv_dim=dp.CONV_HEAD_DIM,
            kernel=dp.CONV_HEAD_KERNEL, dtype=self.dtype,
        )
        self.dp_predictor_module = DensePosePredictor(
            num_patches=dp.NUM_PATCHES, deconv_kernel=dp.DECONV_KERNEL,
            up_scale=dp.UP_SCALE, dtype=self.dtype,
        )
        self.dp_pooled_shape = (dp.POOLER_RESOLUTION, dp.POOLER_RESOLUTION, shapes[0].channels)
        self.index_weights = dp.INDEX_WEIGHTS
        self.part_weights = dp.PART_WEIGHTS
        self.point_weights = dp.POINT_REGRESSION_WEIGHTS
        self.heatmap_size = dp.HEATMAP_SIZE

    def init_params(self, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        params = super().init_params(r1)
        ph, pw, c = self.dp_pooled_shape
        dummy = jnp.zeros((1, ph, pw, c), jnp.float32)
        head = self.dp_head_module.init(r2, dummy)["params"]
        feat = self.dp_head_module.apply({"params": head}, dummy)
        params["densepose_head"] = head
        params["densepose_predictor"] = self.dp_predictor_module.init(r3, feat)["params"]
        return params

    def _dp_forward(self, params, feats, boxes):
        pooled = self.dp_pooler(feats, boxes)
        b, s = pooled.shape[:2]
        flat = pooled.reshape(b * s, *pooled.shape[2:])
        feat = self.dp_head_module.apply({"params": params["densepose_head"]}, flat)
        return self.dp_predictor_module.apply({"params": params["densepose_predictor"]}, feat)

    def forward_train(self, params, features, proposals, batch, rng):
        losses = super().forward_train(params, features, proposals, batch, rng)
        if not self.densepose_on or "dp_points" not in batch:
            return losses
        feats = [features[f] for f in self.in_features]
        sampled = self.label_and_sample_proposals(proposals, batch, rng)
        sampled = jax.tree.map(jax.lax.stop_gradient, sampled)
        fg = _select_fg(sampled, self.max_fg)
        fb, fs = fg["boxes"].shape[:2]
        outputs = self._dp_forward(params, feats, fg["boxes"])

        def gather_inst(tree_field):
            return jnp.take_along_axis(
                batch[tree_field],
                fg["gt_idx"].reshape(fb, fs, *([1] * (batch[tree_field].ndim - 2))),
                axis=1,
            )

        dp_points = gather_inst("dp_points").reshape(fb * fs, *batch["dp_points"].shape[2:])
        dp_uv = gather_inst("dp_uv").reshape(fb * fs, *batch["dp_uv"].shape[2:])
        dp_valid = gather_inst("dp_valid").reshape(fb * fs, *batch["dp_valid"].shape[2:])
        dp_segm = gather_inst("dp_segm").reshape(fb * fs, *batch["dp_segm"].shape[2:])

        dp_losses = densepose_losses(
            outputs,
            fg["boxes"].reshape(fb * fs, 4),
            fg["valid"].reshape(fb * fs),
            dp_points,
            dp_uv,
            dp_valid.astype(bool),
            dp_segm,
            self.index_weights,
            self.part_weights,
            self.point_weights,
        )
        losses.update(dp_losses)
        return losses

    def forward_inference(self, params, features, proposals, batch):
        dets = super().forward_inference(params, features, proposals, batch)
        if not self.densepose_on:
            return dets
        feats = [features[f] for f in self.in_features]
        outputs = self._dp_forward(params, feats, dets["boxes"])
        b, d = dets["boxes"].shape[:2]
        iuv = densepose_inference(outputs)
        # stack into one static (B, D, S, S, 4) tensor: coarse, fine, U, V —
        # a single array field keeps the host Instances contract simple
        stacked = jnp.stack(
            [
                iuv["coarse_segm"].astype(jnp.float32),
                iuv["fine_segm"].astype(jnp.float32),
                iuv["u"],
                iuv["v"],
            ],
            axis=-1,
        )
        dets["densepose"] = stacked.reshape(b, d, *stacked.shape[1:])
        return dets
