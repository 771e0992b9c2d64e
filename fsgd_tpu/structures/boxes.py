"""Axis-aligned boxes, box-mode conversion and pairwise IoU.

Behavioral parity with the reference detectron2/structures/boxes.py:14-301
(``BoxMode``, ``Boxes``, ``pairwise_iou``, ``matched_boxlist_iou``), designed
array-first for TPU: ``Boxes`` is a registered JAX pytree wrapping an (N, 4)
float32 array, and every method is pure/jittable.  In padded pipelines,
invalid rows are simply zero boxes; use ``nonempty`` to build validity masks.
"""

from __future__ import annotations

import math
from enum import IntEnum, unique
from typing import List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

_RawBoxType = Union["Boxes", jnp.ndarray, np.ndarray, List[float], Tuple[float, ...]]


@unique
class BoxMode(IntEnum):
    """Same enum values as the reference (structures/boxes.py:14-69)."""

    XYXY_ABS = 0
    XYWH_ABS = 1
    XYXY_REL = 2
    XYWH_REL = 3
    XYWHA_ABS = 4

    @staticmethod
    def convert(box, from_mode: "BoxMode", to_mode: "BoxMode"):
        """Convert box arrays (..., 4) or (..., 5) between modes."""
        if from_mode == to_mode:
            return box

        original_type = type(box)
        is_numpy = isinstance(box, np.ndarray)
        single_box = isinstance(box, (list, tuple))
        if single_box:
            arr = np.array(box, dtype=np.float64)[None, :]
        else:
            arr = box

        if to_mode in (BoxMode.XYXY_REL, BoxMode.XYWH_REL) or from_mode in (
            BoxMode.XYXY_REL,
            BoxMode.XYWH_REL,
        ):
            raise NotImplementedError("Relative mode not yet supported!")

        xp = np if (is_numpy or single_box) else jnp

        if from_mode == BoxMode.XYWHA_ABS and to_mode == BoxMode.XYXY_ABS:
            cx, cy, w, h, a = [arr[..., i] for i in range(5)]
            # bounding box of the rotated box
            c = xp.abs(xp.cos(a * math.pi / 180.0))
            s = xp.abs(xp.sin(a * math.pi / 180.0))
            new_w = c * w + s * h
            new_h = c * h + s * w
            out = xp.stack(
                [cx - new_w / 2, cy - new_h / 2, cx + new_w / 2, cy + new_h / 2], axis=-1
            )
        elif from_mode == BoxMode.XYWH_ABS and to_mode == BoxMode.XYWHA_ABS:
            x, y, w, h = [arr[..., i] for i in range(4)]
            out = xp.stack([x + w / 2, y + h / 2, w, h, xp.zeros_like(x)], axis=-1)
        elif to_mode == BoxMode.XYXY_ABS and from_mode == BoxMode.XYWH_ABS:
            out = xp.concatenate([arr[..., :2], arr[..., :2] + arr[..., 2:4]], axis=-1)
        elif from_mode == BoxMode.XYXY_ABS and to_mode == BoxMode.XYWH_ABS:
            out = xp.concatenate([arr[..., :2], arr[..., 2:4] - arr[..., :2]], axis=-1)
        else:
            raise NotImplementedError(
                "Conversion from BoxMode {} to {} is not supported".format(from_mode, to_mode)
            )

        if single_box:
            return original_type(out.flatten().tolist())
        return out


@jax.tree_util.register_pytree_node_class
class Boxes:
    """A list of boxes as an (N, 4) float array of (x1, y1, x2, y2)."""

    def __init__(self, tensor):
        if isinstance(tensor, Boxes):
            tensor = tensor.tensor
        tensor = jnp.asarray(tensor, dtype=jnp.float32)
        if tensor.size == 0:
            tensor = tensor.reshape(0, 4)
        assert tensor.ndim == 2 and tensor.shape[-1] == 4, tensor.shape
        self.tensor = tensor

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.tensor,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.tensor = children[0]
        return obj

    # -- ops ----------------------------------------------------------------
    def clone(self) -> "Boxes":
        return Boxes(self.tensor)

    def to(self, *args, **kwargs) -> "Boxes":  # API compat; device moves are implicit in JAX
        return Boxes(self.tensor)

    def numpy(self) -> np.ndarray:
        return np.asarray(self.tensor)

    def area(self) -> jnp.ndarray:
        t = self.tensor
        return (t[:, 2] - t[:, 0]) * (t[:, 3] - t[:, 1])

    def clip(self, box_size: Tuple[int, int]) -> "Boxes":
        """Clip coordinates to [0, w] x [0, h].  Returns a new Boxes (functional)."""
        h, w = box_size
        t = self.tensor
        x1 = jnp.clip(t[:, 0], 0, w)
        y1 = jnp.clip(t[:, 1], 0, h)
        x2 = jnp.clip(t[:, 2], 0, w)
        y2 = jnp.clip(t[:, 3], 0, h)
        return Boxes(jnp.stack([x1, y1, x2, y2], axis=-1))

    def nonempty(self, threshold: float = 0.0) -> jnp.ndarray:
        t = self.tensor
        widths = t[:, 2] - t[:, 0]
        heights = t[:, 3] - t[:, 1]
        return (widths > threshold) & (heights > threshold)

    def inside_box(self, box_size: Tuple[int, int], boundary_threshold: int = 0) -> jnp.ndarray:
        h, w = box_size
        t = self.tensor
        return (
            (t[:, 0] >= -boundary_threshold)
            & (t[:, 1] >= -boundary_threshold)
            & (t[:, 2] < w + boundary_threshold)
            & (t[:, 3] < h + boundary_threshold)
        )

    def get_centers(self) -> jnp.ndarray:
        return (self.tensor[:, :2] + self.tensor[:, 2:]) / 2

    def scale(self, scale_x: float, scale_y: float) -> "Boxes":
        s = jnp.asarray([scale_x, scale_y, scale_x, scale_y], dtype=jnp.float32)
        return Boxes(self.tensor * s)

    def __getitem__(self, item) -> "Boxes":
        if isinstance(item, int):
            return Boxes(self.tensor[item][None, :])
        return Boxes(self.tensor[item])

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __repr__(self) -> str:
        return "Boxes({})".format(self.tensor)

    @classmethod
    def cat(cls, boxes_list: List["Boxes"]) -> "Boxes":
        if len(boxes_list) == 0:
            return cls(jnp.zeros((0, 4), dtype=jnp.float32))
        return cls(jnp.concatenate([b.tensor for b in boxes_list], axis=0))

    @property
    def device(self):
        return self.tensor.device


def _as_box_array(boxes) -> jnp.ndarray:
    return boxes.tensor if isinstance(boxes, Boxes) else jnp.asarray(boxes, jnp.float32)


def pairwise_intersection(boxes1, boxes2) -> jnp.ndarray:
    b1, b2 = _as_box_array(boxes1), _as_box_array(boxes2)
    lt = jnp.maximum(b1[:, None, :2], b2[None, :, :2])  # (N, M, 2)
    rb = jnp.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1, boxes2) -> jnp.ndarray:
    """IoU matrix of shape (N, M); zero where union is empty (matches reference)."""
    b1, b2 = _as_box_array(boxes1), _as_box_array(boxes2)
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    inter = pairwise_intersection(b1, b2)
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def pairwise_ioa(boxes1, boxes2) -> jnp.ndarray:
    """Intersection over area of boxes2."""
    b2 = _as_box_array(boxes2)
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    inter = pairwise_intersection(boxes1, b2)
    return jnp.where(area2[None, :] > 0, inter / jnp.where(area2[None, :] > 0, area2[None, :], 1.0), 0.0)


def matched_boxlist_iou(boxes1, boxes2) -> jnp.ndarray:
    """Element-wise IoU of two equal-length box lists."""
    b1, b2 = _as_box_array(boxes1), _as_box_array(boxes2)
    assert b1.shape[0] == b2.shape[0]
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = jnp.maximum(b1[:, :2], b2[:, :2])
    rb = jnp.minimum(b1[:, 2:], b2[:, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[:, 0] * wh[:, 1]
    union = area1 + area2 - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
