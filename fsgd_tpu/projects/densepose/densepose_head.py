"""DensePose head, predictor, losses and inference.

Parity target: projects/DensePose/densepose/densepose_head.py:24-650
(``DensePoseV1ConvXHead``: 8 stacked 3x3 convs; ``DensePosePredictor``:
deconv + 2x upsample to four output banks — AnnIndex (coarse segmentation,
15 ch), IndexUV (patch index, 25 ch), U, V (per-patch regressions);
``DensePoseLosses``: CE on coarse segm over the box, CE on patch index at
annotated points, smooth-L1 on U/V at points of the GT patch;
``densepose_inference``: attach per-detection IUV maps).

TPU design: points are padded to ``MAX_DP_POINTS`` per instance with a
validity mask; per-point sampling of the 56x56 output banks is a bilinear
gather; all losses are masked sums — one static program.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

msra_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class DensePoseV1ConvXHead(nn.Module):
    """N stacked conv3x3 + relu (reference densepose_head.py:24-56)."""

    num_convs: int = 8
    conv_dim: int = 512
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2
        for i in range(self.num_convs):
            x = nn.Conv(
                self.conv_dim, (self.kernel, self.kernel), padding=((p, p), (p, p)),
                kernel_init=msra_init, dtype=self.dtype, param_dtype=jnp.float32,
                name="body_conv_fcn{}".format(i + 1),
            )(x)
            x = nn.relu(x)
        return x


class DensePosePredictor(nn.Module):
    """Deconv x2 + bilinear x2 to HEATMAP_SIZE; four output banks
    (reference densepose_head.py:57-154)."""

    num_patches: int = 24
    deconv_kernel: int = 4
    up_scale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def bank(name, channels):
            k = self.deconv_kernel
            y = nn.ConvTranspose(
                channels, (k, k), strides=(2, 2), padding="SAME",
                kernel_init=msra_init, dtype=self.dtype, param_dtype=jnp.float32,
                name=name,
            )(x)
            n, h, w, c = y.shape
            return jax.image.resize(
                y, (n, h * self.up_scale, w * self.up_scale, c), method="bilinear"
            ).astype(jnp.float32)

        ann_index = bank("ann_index_lowres", 15)  # coarse segmentation (S)
        index_uv = bank("index_uv_lowres", self.num_patches + 1)  # patch index (I)
        u = bank("u_lowres", self.num_patches + 1)
        v = bank("v_lowres", self.num_patches + 1)
        return ann_index, index_uv, u, v


def _sample_bank(bank: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample (H, W, C) at normalized-in-heatmap coords (P,) each."""
    h, w, c = bank.shape
    x = jnp.clip(xs, 0, w - 1.001)
    y = jnp.clip(ys, 0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    lx = x - x0
    ly = y - y0
    v00 = bank[y0, x0]
    v01 = bank[y0, x0 + 1]
    v10 = bank[y0 + 1, x0]
    v11 = bank[y0 + 1, x0 + 1]
    return (
        v00 * ((1 - ly) * (1 - lx))[:, None]
        + v01 * ((1 - ly) * lx)[:, None]
        + v10 * (ly * (1 - lx))[:, None]
        + v11 * (ly * lx)[:, None]
    )


def densepose_losses(
    outputs: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
    boxes: jnp.ndarray,  # (N, 4) fg proposal boxes
    fg_valid: jnp.ndarray,  # (N,)
    dp_points: jnp.ndarray,  # (N, P, 4): x, y (image coords), patch index I, ignored
    dp_uv: jnp.ndarray,  # (N, P, 2): gt U, V
    dp_valid: jnp.ndarray,  # (N, P)
    dp_segm: jnp.ndarray,  # (N, S, S) coarse segmentation GT (0..14), S=heatmap
    index_weights: float,
    part_weights: float,
    point_weights: float,
) -> Dict[str, jnp.ndarray]:
    """Masked DensePose losses (reference DensePoseLosses.__call__, :504-650)."""
    ann_index, index_uv, u_bank, v_bank = outputs  # (N, S, S, C)
    n, s = ann_index.shape[0], ann_index.shape[1]

    # coarse segmentation CE over the whole box
    log_probs = jax.nn.log_softmax(ann_index, axis=-1)
    nll = -jnp.take_along_axis(log_probs, dp_segm[..., None].astype(jnp.int32), axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(fg_valid) * s * s, 1)
    loss_segm = jnp.sum(jnp.where(fg_valid[:, None, None], nll, 0.0)) / denom

    # map annotated points into heatmap coords
    x1, y1 = boxes[:, 0:1], boxes[:, 1:2]
    bw = jnp.maximum(boxes[:, 2:3] - boxes[:, 0:1], 1.0)
    bh = jnp.maximum(boxes[:, 3:4] - boxes[:, 1:2], 1.0)
    px = (dp_points[..., 0] - x1) / bw * s
    py = (dp_points[..., 1] - y1) / bh * s
    gt_i = dp_points[..., 2].astype(jnp.int32)
    valid = dp_valid & fg_valid[:, None]

    def per_instance(iuv_bank, ub, vb, pxi, pyi):
        iuv = _sample_bank(iuv_bank, pxi, pyi)  # (P, 25)
        uu = _sample_bank(ub, pxi, pyi)
        vv = _sample_bank(vb, pxi, pyi)
        return iuv, uu, vv

    iuv_pts, u_pts, v_pts = jax.vmap(per_instance)(index_uv, u_bank, v_bank, px, py)

    # patch-index CE at points
    lp = jax.nn.log_softmax(iuv_pts, axis=-1)
    nll_i = -jnp.take_along_axis(lp, gt_i[..., None], axis=-1)[..., 0]
    n_pts = jnp.maximum(jnp.sum(valid), 1)
    loss_index = jnp.sum(jnp.where(valid, nll_i, 0.0)) / n_pts

    # UV smooth-L1 at points, channel of the GT patch
    u_sel = jnp.take_along_axis(u_pts, gt_i[..., None], axis=-1)[..., 0]
    v_sel = jnp.take_along_axis(v_pts, gt_i[..., None], axis=-1)[..., 0]
    uv_valid = valid & (gt_i > 0)
    n_uv = jnp.maximum(jnp.sum(uv_valid), 1)

    def sl1(a, b):
        d = jnp.abs(a - b)
        return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)

    loss_u = jnp.sum(jnp.where(uv_valid, sl1(u_sel, dp_uv[..., 0]), 0.0)) / n_uv
    loss_v = jnp.sum(jnp.where(uv_valid, sl1(v_sel, dp_uv[..., 1]), 0.0)) / n_uv

    return {
        "loss_densepose_S": loss_segm * index_weights,
        "loss_densepose_I": loss_index * part_weights,
        "loss_densepose_U": loss_u * point_weights,
        "loss_densepose_V": loss_v * point_weights,
    }


def densepose_inference(outputs) -> Dict[str, jnp.ndarray]:
    """Turn the four banks into per-detection IUV results
    (reference densepose_head.py:155-210)."""
    ann_index, index_uv, u_bank, v_bank = outputs
    seg = jnp.argmax(ann_index, axis=-1)  # (N, S, S)
    i_map = jnp.argmax(index_uv, axis=-1)  # (N, S, S)
    u = jnp.take_along_axis(u_bank, i_map[..., None], axis=-1)[..., 0]
    v = jnp.take_along_axis(v_bank, i_map[..., None], axis=-1)[..., 0]
    return {"coarse_segm": seg, "fine_segm": i_map, "u": jnp.clip(u, 0, 1), "v": jnp.clip(v, 0, 1)}
