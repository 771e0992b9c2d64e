"""Rotated boxes (cx, cy, w, h, angle) structure.

Parity with detectron2/structures/rotated_boxes.py:12-498.  The pairwise IoU
delegates to the vectorized polygon-clipping op in
:mod:`fsgd_tpu.ops.rotated_iou` (the TPU replacement of the reference's
``box_iou_rotated`` CUDA kernel).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..ops.rotated_iou import pairwise_iou_rotated as _pairwise_iou_rotated


@jax.tree_util.register_pytree_node_class
class RotatedBoxes:
    """(N, 5) float array of (x_center, y_center, width, height, angle_degrees)."""

    def __init__(self, tensor):
        if isinstance(tensor, RotatedBoxes):
            tensor = tensor.tensor
        tensor = jnp.asarray(tensor, dtype=jnp.float32)
        if tensor.size == 0:
            tensor = tensor.reshape(0, 5)
        assert tensor.ndim == 2 and tensor.shape[-1] == 5, tensor.shape
        self.tensor = tensor

    def tree_flatten(self):
        return (self.tensor,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.tensor = children[0]
        return obj

    def clone(self) -> "RotatedBoxes":
        return RotatedBoxes(self.tensor)

    def to(self, *args, **kwargs) -> "RotatedBoxes":
        return RotatedBoxes(self.tensor)

    def area(self) -> jnp.ndarray:
        return self.tensor[:, 2] * self.tensor[:, 3]

    def normalize_angles(self) -> "RotatedBoxes":
        """Restrict angles to (-180, 180] (reference rotated_boxes.py:201-208)."""
        t = self.tensor
        a = (t[:, 4] + 180.0) % 360.0 - 180.0
        a = jnp.where(a == -180.0, 180.0, a)
        return RotatedBoxes(jnp.concatenate([t[:, :4], a[:, None]], axis=1))

    def clip(self, box_size: Tuple[int, int], clip_angle_threshold: float = 1.0) -> "RotatedBoxes":
        """Clip *nearly axis-aligned* boxes (|angle| <= threshold) to the image.

        Same semantics as the reference (rotated_boxes.py:210-260): rotated
        boxes cannot be clipped exactly, so only near-horizontal ones are.
        """
        h, w = box_size
        t = self.normalize_angles().tensor
        cx, cy, bw, bh, a = [t[:, i] for i in range(5)]
        nearly_horizontal = jnp.abs(a) <= clip_angle_threshold

        x1 = jnp.clip(cx - bw / 2, 0, w)
        y1 = jnp.clip(cy - bh / 2, 0, h)
        x2 = jnp.clip(cx + bw / 2, 0, w)
        y2 = jnp.clip(cy + bh / 2, 0, h)
        ncx = (x1 + x2) / 2
        ncy = (y1 + y2) / 2
        nw = x2 - x1
        nh = y2 - y1

        cx = jnp.where(nearly_horizontal, ncx, cx)
        cy = jnp.where(nearly_horizontal, ncy, cy)
        bw = jnp.where(nearly_horizontal, nw, bw)
        bh = jnp.where(nearly_horizontal, nh, bh)
        return RotatedBoxes(jnp.stack([cx, cy, bw, bh, a], axis=1))

    def nonempty(self, threshold: float = 0.0) -> jnp.ndarray:
        return (self.tensor[:, 2] > threshold) & (self.tensor[:, 3] > threshold)

    def inside_box(self, box_size: Tuple[int, int], boundary_threshold: int = 0) -> jnp.ndarray:
        """Whether box centers are inside the image (reference semantics)."""
        h, w = box_size
        t = self.tensor
        return (
            (t[:, 0] >= -boundary_threshold)
            & (t[:, 1] >= -boundary_threshold)
            & (t[:, 0] < w + boundary_threshold)
            & (t[:, 1] < h + boundary_threshold)
        )

    def get_centers(self) -> jnp.ndarray:
        return self.tensor[:, :2]

    def scale(self, scale_x: float, scale_y: float) -> "RotatedBoxes":
        """Scale, including width/height/angle adjustment for anisotropic scaling
        (reference rotated_boxes.py:338-403)."""
        t = self.tensor
        cx = t[:, 0] * scale_x
        cy = t[:, 1] * scale_y
        theta = t[:, 4] * math.pi / 180.0
        c = jnp.cos(theta)
        s = jnp.sin(theta)
        w = t[:, 2] * jnp.sqrt((scale_x * c) ** 2 + (scale_y * s) ** 2)
        h = t[:, 3] * jnp.sqrt((scale_x * s) ** 2 + (scale_y * c) ** 2)
        angle = jnp.arctan2(scale_x * s, scale_y * c) * 180.0 / math.pi
        return RotatedBoxes(jnp.stack([cx, cy, w, h, angle], axis=1))

    def __getitem__(self, item) -> "RotatedBoxes":
        if isinstance(item, int):
            return RotatedBoxes(self.tensor[item][None])
        return RotatedBoxes(self.tensor[item])

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __repr__(self) -> str:
        return "RotatedBoxes({})".format(self.tensor)

    @classmethod
    def cat(cls, boxes_list: List["RotatedBoxes"]) -> "RotatedBoxes":
        if len(boxes_list) == 0:
            return cls(jnp.zeros((0, 5), dtype=jnp.float32))
        return cls(jnp.concatenate([b.tensor for b in boxes_list], axis=0))

    @property
    def device(self):
        return self.tensor.device


def pairwise_iou(boxes1: RotatedBoxes, boxes2: RotatedBoxes) -> jnp.ndarray:
    """(N, M) IoU matrix of rotated boxes."""
    return _pairwise_iou_rotated(boxes1, boxes2)
