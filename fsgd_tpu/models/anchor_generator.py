"""Anchor generation.

Parity with detectron2/modeling/anchor_generator.py:53-344
(``DefaultAnchorGenerator`` and ``RotatedAnchorGenerator``): identical cell
anchor order (sizes-major, aspect-ratios-minor), identical grid offsets
(centers at ``(x * stride, y * stride)``).  Anchors are pure functions of the
static feature map sizes, so they are computed once per shape bucket at trace
time and become XLA constants.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np

from ..layers import ShapeSpec
from ..structures import Boxes, RotatedBoxes
from .build import ANCHOR_GENERATOR_REGISTRY


def _broadcast_params(params, num_features, name):
    assert isinstance(params, (list, tuple)), "{} must be a list".format(name)
    if not isinstance(params[0], (list, tuple)):
        return [list(params)] * num_features
    if len(params) == 1:
        return list(params) * num_features
    assert len(params) == num_features, (
        "Got {} of length {} for {} feature maps".format(name, len(params), num_features)
    )
    return [list(p) for p in params]


def generate_cell_anchors(sizes=(32, 64, 128, 256, 512), aspect_ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    """(len(sizes)*len(aspect_ratios), 4) anchors in xyxy centered at (0, 0)."""
    anchors = []
    for size in sizes:
        area = size ** 2.0
        for aspect_ratio in aspect_ratios:
            w = math.sqrt(area / aspect_ratio)
            h = aspect_ratio * w
            anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.array(anchors, dtype=np.float32)


def generate_rotated_cell_anchors(
    sizes=(32, 64, 128, 256, 512), aspect_ratios=(0.5, 1.0, 2.0), angles=(-90, -60, -30, 0, 30, 60, 90)
) -> np.ndarray:
    """(S*A*G, 5) rotated anchors (cx, cy, w, h, angle) centered at origin."""
    anchors = []
    for size in sizes:
        area = size ** 2.0
        for aspect_ratio in aspect_ratios:
            w = math.sqrt(area / aspect_ratio)
            h = aspect_ratio * w
            anchors.extend([0, 0, w, h, a] for a in angles)
    return np.array(anchors, dtype=np.float32)


class DefaultAnchorGenerator:
    """Computes per-level grids of anchors for given static feature sizes."""

    box_dim = 4

    def __init__(self, cfg, input_shapes: Sequence[ShapeSpec]):
        sizes = cfg.MODEL.ANCHOR_GENERATOR.SIZES
        aspect_ratios = cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS
        self.strides = [s.stride for s in input_shapes]
        num_features = len(input_shapes)
        sizes = _broadcast_params(sizes, num_features, "SIZES")
        aspect_ratios = _broadcast_params(aspect_ratios, num_features, "ASPECT_RATIOS")
        self.cell_anchors = [generate_cell_anchors(s, a) for s, a in zip(sizes, aspect_ratios)]

    @property
    def num_cell_anchors(self) -> List[int]:
        return [len(c) for c in self.cell_anchors]

    def _grid_anchors(self, grid_sizes) -> List[np.ndarray]:
        anchors = []
        for (h, w), stride, cell in zip(grid_sizes, self.strides, self.cell_anchors):
            shifts_x = np.arange(0, w, dtype=np.float32) * stride
            shifts_y = np.arange(0, h, dtype=np.float32) * stride
            sx, sy = np.meshgrid(shifts_x, shifts_y)  # (h, w)
            shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
            a = (shifts + cell[None, :, :]).reshape(-1, 4)  # (h*w*A, 4), anchors fastest
            anchors.append(a)
        return anchors

    def __call__(self, grid_sizes: Sequence) -> List[Boxes]:
        """grid_sizes: list of (h, w) per level (static ints)."""
        return [Boxes(jnp.asarray(a)) for a in self._grid_anchors(grid_sizes)]


class RotatedAnchorGenerator:
    box_dim = 5

    def __init__(self, cfg, input_shapes: Sequence[ShapeSpec]):
        sizes = cfg.MODEL.ANCHOR_GENERATOR.SIZES
        aspect_ratios = cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS
        angles = cfg.MODEL.ANCHOR_GENERATOR.ANGLES
        self.strides = [s.stride for s in input_shapes]
        n = len(input_shapes)
        sizes = _broadcast_params(sizes, n, "SIZES")
        aspect_ratios = _broadcast_params(aspect_ratios, n, "ASPECT_RATIOS")
        angles = _broadcast_params(angles, n, "ANGLES")
        self.cell_anchors = [
            generate_rotated_cell_anchors(s, a, g) for s, a, g in zip(sizes, aspect_ratios, angles)
        ]

    @property
    def num_cell_anchors(self) -> List[int]:
        return [len(c) for c in self.cell_anchors]

    def __call__(self, grid_sizes: Sequence) -> List[RotatedBoxes]:
        out = []
        for (h, w), stride, cell in zip(grid_sizes, self.strides, self.cell_anchors):
            shifts_x = np.arange(0, w, dtype=np.float32) * stride
            shifts_y = np.arange(0, h, dtype=np.float32) * stride
            sx, sy = np.meshgrid(shifts_x, shifts_y)
            zeros = np.zeros_like(sx)
            shifts = np.stack([sx, sy, zeros, zeros, zeros], axis=-1).reshape(-1, 1, 5)
            a = (shifts + cell[None, :, :]).reshape(-1, 5)
            out.append(RotatedBoxes(jnp.asarray(a)))
        return out


# registry entries take (cfg, input_shapes)
ANCHOR_GENERATOR_REGISTRY.register(DefaultAnchorGenerator)
ANCHOR_GENERATOR_REGISTRY.register(RotatedAnchorGenerator)
