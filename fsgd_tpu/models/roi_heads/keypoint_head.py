"""Keypoint R-CNN head and loss.

Parity with detectron2/modeling/roi_heads/keypoint_head.py:29-190
(``KRCNNConvDeconvUpsampleHead``: conv tower + deconv + 2x bilinear upscale;
``keypoint_rcnn_loss``: softmax CE over heatmap bins of visible keypoints,
normalized by visible count when NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS;
``keypoint_rcnn_inference`` via heatmaps_to_keypoints).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...structures.keypoints import heatmaps_to_keypoints, keypoints_to_heatmap
from ..build import ROI_KEYPOINT_HEAD_REGISTRY

msra_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


@ROI_KEYPOINT_HEAD_REGISTRY.register()
class KRCNNConvDeconvUpsampleHead(nn.Module):
    conv_dims: Sequence[int]
    num_keypoints: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: (N, PH, PW, C) -> (N, 4*PH, 4*PW, K) keypoint heatmap logits
        for i, dim in enumerate(self.conv_dims):
            x = nn.Conv(
                dim,
                (3, 3),
                padding=((1, 1), (1, 1)),
                kernel_init=msra_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv_fcn{}".format(i + 1),
            )(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(
            self.num_keypoints,
            (4, 4),
            strides=(2, 2),
            # torch ConvTranspose2d(k=4, s=2, p=1) == flax "SAME" (out = 2*in;
            # flax explicit pads are p_flax = k-1-p_torch, so ((1,1),(1,1))
            # would shrink the heatmap to 26x26 — caught by the keypoint
            # composed-model golden, tests/test_goldens.py)
            padding="SAME",
            kernel_init=msra_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="score_lowres",
        )(x)
        # interpolate 2x (align to reference's F.interpolate bilinear scale 2)
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method="bilinear")
        return x.astype(jnp.float32)


def keypoint_rcnn_loss(
    keypoint_logits: jnp.ndarray,  # (N, S, S, K)
    keypoints: jnp.ndarray,  # (N, K, 3) gt keypoints of the matched instance
    proposal_boxes: jnp.ndarray,  # (N, 4)
    fg_valid: jnp.ndarray,  # (N,)
    normalizer: float | None = None,
) -> jnp.ndarray:
    n, s, _, k = keypoint_logits.shape
    heatmaps, valid = keypoints_to_heatmap(keypoints, proposal_boxes, s)  # (N, K)
    valid = valid.astype(bool) & fg_valid[:, None]

    logits_flat = keypoint_logits.transpose(0, 3, 1, 2).reshape(n * k, s * s)
    targets = heatmaps.reshape(n * k)
    vmask = valid.reshape(n * k)

    log_probs = jax.nn.log_softmax(logits_flat, axis=-1)
    nll = -jnp.take_along_axis(log_probs, targets[:, None].astype(jnp.int32), axis=-1)[:, 0]
    loss = jnp.sum(jnp.where(vmask, nll, 0.0))
    if normalizer is None:
        normalizer = jnp.maximum(jnp.sum(vmask), 1).astype(jnp.float32)
    return loss / normalizer


def keypoint_rcnn_inference(keypoint_logits: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, S, S, K) logits + (N, 4) boxes -> (N, K, 4) (x, y, logit, prob)."""
    maps = keypoint_logits.transpose(0, 3, 1, 2)  # (N, K, S, S)
    return heatmaps_to_keypoints(maps, boxes)
