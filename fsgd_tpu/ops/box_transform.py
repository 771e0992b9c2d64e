"""Box-delta encode/decode transforms.

Parity with the reference detectron2/modeling/box_regression.py:14-210
(``Box2BoxTransform`` with the R-CNN delta parametrization and scale clamp,
and ``Box2BoxTransformRotated`` with the extra angle delta).  Pure jnp,
shape-polymorphic over leading dims, jittable.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

_DEFAULT_SCALE_CLAMP = math.log(1000.0 / 16)

__all__ = ["Box2BoxTransform", "Box2BoxTransformRotated", "apply_deltas", "get_deltas"]


class Box2BoxTransform:
    """dx,dy (center, relative) + dw,dh (log-scale) deltas with per-coord weights."""

    def __init__(self, weights: Tuple[float, float, float, float], scale_clamp: float = _DEFAULT_SCALE_CLAMP):
        self.weights = tuple(weights)
        self.scale_clamp = scale_clamp

    def get_deltas(self, src_boxes, target_boxes):
        """Encode target boxes relative to source boxes; both (..., 4) xyxy."""
        src_boxes = src_boxes.tensor if hasattr(src_boxes, "tensor") else jnp.asarray(src_boxes)
        target_boxes = target_boxes.tensor if hasattr(target_boxes, "tensor") else jnp.asarray(target_boxes)

        src_widths = src_boxes[..., 2] - src_boxes[..., 0]
        src_heights = src_boxes[..., 3] - src_boxes[..., 1]
        src_ctr_x = src_boxes[..., 0] + 0.5 * src_widths
        src_ctr_y = src_boxes[..., 1] + 0.5 * src_heights

        target_widths = target_boxes[..., 2] - target_boxes[..., 0]
        target_heights = target_boxes[..., 3] - target_boxes[..., 1]
        target_ctr_x = target_boxes[..., 0] + 0.5 * target_widths
        target_ctr_y = target_boxes[..., 1] + 0.5 * target_heights

        wx, wy, ww, wh = self.weights
        # guard padded zero boxes: clamp denominators away from 0
        safe_w = jnp.maximum(src_widths, 1e-6)
        safe_h = jnp.maximum(src_heights, 1e-6)
        dx = wx * (target_ctr_x - src_ctr_x) / safe_w
        dy = wy * (target_ctr_y - src_ctr_y) / safe_h
        dw = ww * jnp.log(jnp.maximum(target_widths, 1e-6) / safe_w)
        dh = wh * jnp.log(jnp.maximum(target_heights, 1e-6) / safe_h)
        return jnp.stack([dx, dy, dw, dh], axis=-1)

    def apply_deltas(self, deltas, boxes):
        """Decode deltas (..., k*4) against boxes (..., 4) -> (..., k*4)."""
        boxes = boxes.tensor if hasattr(boxes, "tensor") else jnp.asarray(boxes)
        boxes = boxes.astype(deltas.dtype)

        widths = boxes[..., 2] - boxes[..., 0]
        heights = boxes[..., 3] - boxes[..., 1]
        ctr_x = boxes[..., 0] + 0.5 * widths
        ctr_y = boxes[..., 1] + 0.5 * heights

        wx, wy, ww, wh = self.weights
        dx = deltas[..., 0::4] / wx
        dy = deltas[..., 1::4] / wy
        dw = jnp.minimum(deltas[..., 2::4] / ww, self.scale_clamp)
        dh = jnp.minimum(deltas[..., 3::4] / wh, self.scale_clamp)

        pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
        pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
        pred_w = jnp.exp(dw) * widths[..., None]
        pred_h = jnp.exp(dh) * heights[..., None]

        x1 = pred_ctr_x - 0.5 * pred_w
        y1 = pred_ctr_y - 0.5 * pred_h
        x2 = pred_ctr_x + 0.5 * pred_w
        y2 = pred_ctr_y + 0.5 * pred_h
        # interleave back to (..., k*4)
        out = jnp.stack([x1, y1, x2, y2], axis=-1)  # (..., k, 4)
        return out.reshape(*deltas.shape[:-1], -1)


class Box2BoxTransformRotated:
    """5-dof deltas: dx, dy, dw, dh, da (angle difference in degrees)."""

    def __init__(
        self,
        weights: Tuple[float, float, float, float, float],
        scale_clamp: float = _DEFAULT_SCALE_CLAMP,
    ):
        self.weights = tuple(weights)
        self.scale_clamp = scale_clamp

    def get_deltas(self, src_boxes, target_boxes):
        src = src_boxes.tensor if hasattr(src_boxes, "tensor") else jnp.asarray(src_boxes)
        tgt = target_boxes.tensor if hasattr(target_boxes, "tensor") else jnp.asarray(target_boxes)
        wx, wy, ww, wh, wa = self.weights
        safe_w = jnp.maximum(src[..., 2], 1e-6)
        safe_h = jnp.maximum(src[..., 3], 1e-6)
        dx = wx * (tgt[..., 0] - src[..., 0]) / safe_w
        dy = wy * (tgt[..., 1] - src[..., 1]) / safe_h
        dw = ww * jnp.log(jnp.maximum(tgt[..., 2], 1e-6) / safe_w)
        dh = wh * jnp.log(jnp.maximum(tgt[..., 3], 1e-6) / safe_h)
        da = tgt[..., 4] - src[..., 4]
        # normalize angle difference to (-180, 180]
        da = (da + 180.0) % 360.0 - 180.0
        da = jnp.where(da == -180.0, 180.0, da)
        da = wa * da * math.pi / 180.0
        return jnp.stack([dx, dy, dw, dh, da], axis=-1)

    def apply_deltas(self, deltas, boxes):
        boxes = boxes.tensor if hasattr(boxes, "tensor") else jnp.asarray(boxes)
        boxes = boxes.astype(deltas.dtype)
        assert deltas.shape[-1] % 5 == 0
        wx, wy, ww, wh, wa = self.weights
        dx = deltas[..., 0::5] / wx
        dy = deltas[..., 1::5] / wy
        dw = jnp.minimum(deltas[..., 2::5] / ww, self.scale_clamp)
        dh = jnp.minimum(deltas[..., 3::5] / wh, self.scale_clamp)
        da = deltas[..., 4::5] * 180.0 / math.pi / wa

        pred_cx = dx * boxes[..., 2:3] + boxes[..., 0:1]
        pred_cy = dy * boxes[..., 3:4] + boxes[..., 1:2]
        pred_w = jnp.exp(dw) * boxes[..., 2:3]
        pred_h = jnp.exp(dh) * boxes[..., 3:4]
        pred_a = da + boxes[..., 4:5]
        pred_a = (pred_a + 180.0) % 360.0 - 180.0
        pred_a = jnp.where(pred_a == -180.0, 180.0, pred_a)
        out = jnp.stack([pred_cx, pred_cy, pred_w, pred_h, pred_a], axis=-1)
        return out.reshape(*deltas.shape[:-1], -1)


def get_deltas(src_boxes, target_boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    return Box2BoxTransform(weights).get_deltas(src_boxes, target_boxes)


def apply_deltas(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    return Box2BoxTransform(weights).apply_deltas(deltas, boxes)
