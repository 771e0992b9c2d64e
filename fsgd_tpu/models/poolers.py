"""Multi-level ROI pooling.

Parity with detectron2/modeling/poolers.py:13-235 (``ROIPooler`` with the
FPN-paper Eq.1 level assignment, canonical box 224 at level 4, and
ROIAlignV2/ROIAlignRotated pooling).

TPU design: the per-roi *dynamic* level dispatch of the reference becomes a
mask-combine — every roi is pooled on every level (chunked gathers) and the
per-roi one-hot level mask selects the right result.  This trades #levels x
compute (gather-bound, cheap relative to the heads' matmuls) for a fully
static, branch-free program.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.roi_align import roi_align, roi_align_rotated

__all__ = ["ROIPooler", "assign_boxes_to_levels", "convert_boxes_to_pooler_format"]


def assign_boxes_to_levels(
    boxes: jnp.ndarray, min_level: int, max_level: int, canonical_box_size: int, canonical_level: int
) -> jnp.ndarray:
    """FPN Eq.1: level = floor(canonical + log2(sqrt(area)/canonical_size)).

    boxes: (..., 4) xyxy.  Returns (...,) int32 in [min_level, max_level].
    """
    area = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0
    )
    sqrt_area = jnp.sqrt(area)
    lvl = jnp.floor(canonical_level + jnp.log2(sqrt_area / canonical_box_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def convert_boxes_to_pooler_format(boxes: jnp.ndarray) -> jnp.ndarray:
    """(B, P, 4) -> (B*P, 5) rois with leading batch index."""
    b, p = boxes.shape[:2]
    batch_idx = jnp.repeat(jnp.arange(b, dtype=boxes.dtype), p)[:, None]
    return jnp.concatenate([batch_idx, boxes.reshape(b * p, -1)], axis=1)


class ROIPooler:
    def __init__(
        self,
        output_size,
        scales: Sequence[float],
        sampling_ratio: int,
        pooler_type: str,
        canonical_box_size: int = 224,
        canonical_level: int = 4,
    ):
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        self.output_size = tuple(output_size)
        self.scales = list(scales)
        self.sampling_ratio = sampling_ratio
        self.pooler_type = pooler_type
        assert pooler_type in ("ROIAlign", "ROIAlignV2", "ROIAlignRotated", "ROIPool"), pooler_type
        self.min_level = -int(math.log2(scales[0]))
        self.max_level = -int(math.log2(scales[-1]))
        assert self.max_level - self.min_level + 1 == len(scales), "scales must be contiguous powers of 2"
        self.canonical_box_size = canonical_box_size
        self.canonical_level = canonical_level
        # FPN level assignment puts SQUARE boxes' bin sizes in [2, 4) cells
        # (level = floor(...) leaves a fractional 2^f, f in [0,1), on the
        # canonical 2 cells/bin), and aspect ratio stretches the long side
        # by sqrt(aspect) — so the reference's adaptive ceil(bin) grid uses
        # 2-4 samples per side for square rois and up to 4*sqrt(aspect) for
        # elongated ones.  A bound of 8 (aspect <= 4) reproduces the
        # reference exactly for every realistic roi; in the packed path the
        # bound only sizes the (cheap, vectorized) interpolation-bank build,
        # not the MXU contractions.  (A cap of 2 undersampled most rois by
        # ~10% in pooled values — caught by the composed-model goldens.)
        self.max_grid = 8
        self.roi_chunk = 512
        # packed-pyramid windowed-matmul path (see ops/roi_align_packed.py);
        # window must cover a roi's cell span at its assigned level
        self.use_packed = True
        self.window = 48

    def __call__(self, features: List[jnp.ndarray], boxes: jnp.ndarray) -> jnp.ndarray:
        """
        Args:
            features: per-level NHWC maps (finest first), matching ``scales``.
            boxes: (B, P, 4) xyxy (or (B, P, 5) rotated) in input coordinates.

        Returns:
            (B, P, PH, PW, C) pooled features.
        """
        b, p = boxes.shape[:2]
        rois = convert_boxes_to_pooler_format(boxes)
        aligned = self.pooler_type in ("ROIAlignV2", "ROIAlignRotated")
        rotated = self.pooler_type == "ROIAlignRotated"

        if self.pooler_type == "ROIPool":
            return self._roi_pool(features, boxes, rois).reshape(b, p, *self.output_size, -1)

        if len(self.scales) == 1:
            if rotated:
                out = roi_align_rotated(
                    features[0], rois, self.output_size, self.scales[0], self.sampling_ratio,
                    max_grid=self.max_grid, roi_chunk=self.roi_chunk,
                )
            else:
                out = roi_align(
                    features[0], rois, self.output_size, self.scales[0], self.sampling_ratio,
                    aligned, max_grid=self.max_grid, roi_chunk=self.roi_chunk,
                )
            return out.reshape(b, p, *self.output_size, -1)

        levels = assign_boxes_to_levels(
            boxes.reshape(-1, boxes.shape[-1])[:, :4] if rotated else rois[:, 1:5],
            self.min_level,
            self.max_level,
            self.canonical_box_size,
            self.canonical_level,
        )
        if rotated:  # area from (w, h) of rotated rois
            w = rois[:, 3]
            h = rois[:, 4]
            sqrt_area = jnp.sqrt(jnp.maximum(w * h, 0))
            lvl = jnp.floor(self.canonical_level + jnp.log2(sqrt_area / self.canonical_box_size + 1e-8))
            levels = jnp.clip(lvl, self.min_level, self.max_level).astype(jnp.int32)

        if not rotated and self.use_packed:
            # production path: packed-pyramid windowed-matmul ROIAlign
            from ..ops.roi_align_packed import roi_align_packed

            strides = tuple(int(round(1.0 / s)) for s in self.scales)
            grid = self.sampling_ratio if self.sampling_ratio > 0 else self.max_grid
            out = roi_align_packed(
                tuple(features),
                boxes[..., :4],
                (levels - self.min_level).reshape(b, p),
                strides,
                self.output_size,
                grid=grid,
                window=self.window,
                aligned=aligned,
                roi_chunk=self.roi_chunk,
                adaptive=self.sampling_ratio <= 0,
            )
            return out

        out = None
        for i, (feat, scale) in enumerate(zip(features, self.scales)):
            if rotated:
                pooled = roi_align_rotated(
                    feat, rois, self.output_size, scale, self.sampling_ratio,
                    max_grid=self.max_grid, roi_chunk=self.roi_chunk,
                )
            else:
                pooled = roi_align(
                    feat, rois, self.output_size, scale, self.sampling_ratio,
                    aligned, max_grid=self.max_grid, roi_chunk=self.roi_chunk,
                )
            mask = (levels == self.min_level + i).astype(pooled.dtype)[:, None, None, None]
            out = pooled * mask if out is None else out + pooled * mask
        return out.reshape(b, p, *self.output_size, -1)

    def _roi_pool(self, features, boxes, rois):
        """Quantized max pooling (reference poolers.py:95-100 "ROIPool"),
        mask-combined across levels like the align path."""
        from ..ops.roi_pool import roi_pool

        grid = self.sampling_ratio if self.sampling_ratio > 0 else 4
        if len(self.scales) == 1:
            return roi_pool(
                features[0], rois, self.output_size, self.scales[0], grid=grid,
                roi_chunk=self.roi_chunk,
            )
        levels = assign_boxes_to_levels(
            rois[:, 1:5], self.min_level, self.max_level,
            self.canonical_box_size, self.canonical_level,
        )
        out = None
        for i, (feat, scale) in enumerate(zip(features, self.scales)):
            pooled = roi_pool(
                feat, rois, self.output_size, scale, grid=grid, roi_chunk=self.roi_chunk
            )
            mask = (levels == self.min_level + i).astype(pooled.dtype)[:, None, None, None]
            out = pooled * mask if out is None else out + pooled * mask
        return out
