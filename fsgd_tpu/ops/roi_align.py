"""ROIAlign (and rotated variant) as batched gather + bilinear math.

TPU-native replacement of the reference's native kernels
detectron2/layers/csrc/ROIAlign/* (1055 LoC) and ROIAlignRotated/* (1069 LoC),
with the ``aligned=True`` half-pixel semantics of "ROIAlignV2"
(detectron2/layers/roi_align.py:51-96) preserved exactly — the reference's
golden unit tests (tests/test_roi_align.py:11-48) are ported against this op.

Design: instead of a scalar per-(roi, bin, sample) CUDA loop, all sample
coordinates are computed as one (N, PH, PW, S, S) array, the four bilinear
corners become four vectorized gathers from the NHWC feature map, and the
sample average is a masked mean (the ``sampling_ratio=0`` adaptive grid uses
*traced* per-roi grid counts under a static S=``max_grid`` bound, so shapes
stay static under jit).  Gathers are chunked over ROIs to bound memory.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["roi_align", "roi_align_rotated", "ROIAlign", "ROIAlignRotated"]


def _bilinear_gather(features: jnp.ndarray, b: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Sample features (B, H, W, C) at float coords; outside -> 0.

    Border semantics match the reference ROIAlign_cpu.cpp bilinear_interpolate:
    samples with y < -1 or y > H (resp. x) contribute zero; coordinates in
    [-1, 0] clamp to 0, [H-1, H] clamp to H-1.
    """
    _, h, w, _ = features.shape
    oob = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = jnp.clip(y, 0.0, h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = y - y0
    lx = x - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    def g(yy, xx):
        return features[b, yy, xx, :]  # vectorized gather -> (..., C)

    val = (
        g(y0, x0) * (hy * hx)[..., None]
        + g(y0, x1) * (hy * lx)[..., None]
        + g(y1, x0) * (ly * hx)[..., None]
        + g(y1, x1) * (ly * lx)[..., None]
    )
    return jnp.where(oob[..., None], 0.0, val)


def _roi_align_chunk(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: Tuple[int, int],
    spatial_scale: float,
    sampling_ratio: int,
    aligned: bool,
    max_grid: int,
) -> jnp.ndarray:
    ph, pw = output_size
    n = rois.shape[0]
    offset = 0.5 if aligned else 0.0
    batch_idx = rois[:, 0].astype(jnp.int32)
    start_x = rois[:, 1] * spatial_scale - offset
    start_y = rois[:, 2] * spatial_scale - offset
    end_x = rois[:, 3] * spatial_scale - offset
    end_y = rois[:, 4] * spatial_scale - offset
    roi_w = end_x - start_x
    roi_h = end_y - start_y
    if not aligned:  # legacy ROIAlignV1 forces min size 1
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / pw
    bin_h = roi_h / ph

    if sampling_ratio > 0:
        grid_h = jnp.full((n,), sampling_ratio, jnp.float32)
        grid_w = jnp.full((n,), sampling_ratio, jnp.float32)
        s = sampling_ratio
    else:
        # adaptive grid = ceil(roi_size / pooled_size), traced per roi,
        # statically bounded by max_grid
        # zero-size rois keep grid 0 -> zero output (reference count semantics)
        grid_h = jnp.clip(jnp.ceil(bin_h), 0, max_grid)
        grid_w = jnp.clip(jnp.ceil(bin_w), 0, max_grid)
        s = max_grid

    iy = jnp.arange(s, dtype=jnp.float32)
    # sample positions inside a bin: (iy + 0.5) * bin / grid
    # shapes: (N, PH, PW, S, S) for y/x
    bins_y = jnp.arange(ph, dtype=jnp.float32)
    bins_x = jnp.arange(pw, dtype=jnp.float32)

    y = (
        start_y[:, None, None]
        + bins_y[None, :, None] * bin_h[:, None, None]
        + (iy[None, None, :] + 0.5) * (bin_h[:, None, None] / jnp.maximum(grid_h[:, None, None], 1.0))
    )  # (N, PH, S)
    x = (
        start_x[:, None, None]
        + bins_x[None, :, None] * bin_w[:, None, None]
        + (iy[None, None, :] + 0.5) * (bin_w[:, None, None] / jnp.maximum(grid_w[:, None, None], 1.0))
    )  # (N, PW, S)

    yy = y[:, :, None, :, None]  # (N, PH, 1, S, 1)
    xx = x[:, None, :, None, :]  # (N, 1, PW, 1, S)
    yy = jnp.broadcast_to(yy, (n, ph, pw, s, s))
    xx = jnp.broadcast_to(xx, (n, ph, pw, s, s))
    bb = jnp.broadcast_to(batch_idx[:, None, None, None, None], (n, ph, pw, s, s))

    vals = _bilinear_gather(features, bb, yy, xx)  # (N, PH, PW, S, S, C)

    sample_valid = (
        (iy[None, :, None] < grid_h[:, None, None])  # (N, S, 1)
        & (iy[None, None, :] < grid_w[:, None, None])  # (N, 1, S)
    )  # (N, S, S)
    w_mask = sample_valid[:, None, None, :, :, None].astype(vals.dtype)
    count = jnp.maximum(grid_h * grid_w, 1.0)[:, None, None, None]
    out = jnp.sum(vals * w_mask, axis=(3, 4)) / count
    return out


@partial(
    jax.jit,
    static_argnames=("output_size", "spatial_scale", "sampling_ratio", "aligned", "max_grid", "roi_chunk"),
)
def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: Tuple[int, int],
    spatial_scale: float = 1.0,
    sampling_ratio: int = 0,
    aligned: bool = True,
    max_grid: int = 8,
    roi_chunk: int = 128,
) -> jnp.ndarray:
    """ROIAlign.

    Args:
        features: (B, H, W, C) NHWC feature map.
        rois: (N, 5) of (batch_index, x1, y1, x2, y2) in input coordinates.
        output_size: (PH, PW).
        spatial_scale: feature stride reciprocal.
        sampling_ratio: samples per bin side; 0 = adaptive ceil(bin) up to
            ``max_grid``.
        aligned: half-pixel ROIAlignV2 semantics when True.

    Returns:
        (N, PH, PW, C).
    """
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    n = rois.shape[0]
    if n == 0:
        return jnp.zeros((0, *output_size, features.shape[-1]), features.dtype)
    if n <= roi_chunk:
        return _roi_align_chunk(features, rois, output_size, spatial_scale, sampling_ratio, aligned, max_grid)
    pad = (-n) % roi_chunk
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    chunks = rois_p.reshape(-1, roi_chunk, 5)
    out = jax.lax.map(
        lambda r: _roi_align_chunk(features, r, output_size, spatial_scale, sampling_ratio, aligned, max_grid),
        chunks,
    )
    return out.reshape(-1, *output_size, features.shape[-1])[:n]


def _roi_align_rotated_chunk(
    features, rois, output_size, spatial_scale, sampling_ratio, max_grid
):
    """Rotated rois: (N, 6) of (batch_index, cx, cy, w, h, angle_deg), CCW.

    Always aligned (continuous coordinate) semantics, matching
    detectron2/layers/roi_align_rotated.py:46-58.
    """
    ph, pw = output_size
    n = rois.shape[0]
    batch_idx = rois[:, 0].astype(jnp.int32)
    cx = rois[:, 1] * spatial_scale - 0.5
    cy = rois[:, 2] * spatial_scale - 0.5
    roi_w = rois[:, 3] * spatial_scale
    roi_h = rois[:, 4] * spatial_scale
    theta = rois[:, 5] * (math.pi / 180.0)
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)

    bin_w = roi_w / pw
    bin_h = roi_h / ph

    if sampling_ratio > 0:
        grid_h = jnp.full((n,), sampling_ratio, jnp.float32)
        grid_w = jnp.full((n,), sampling_ratio, jnp.float32)
        s = sampling_ratio
    else:
        # zero-size rois keep grid 0 -> zero output (reference count semantics)
        grid_h = jnp.clip(jnp.ceil(bin_h), 0, max_grid)
        grid_w = jnp.clip(jnp.ceil(bin_w), 0, max_grid)
        s = max_grid

    iy = jnp.arange(s, dtype=jnp.float32)
    bins_y = jnp.arange(ph, dtype=jnp.float32)
    bins_x = jnp.arange(pw, dtype=jnp.float32)

    # local (box-frame) coordinates relative to roi center
    ly = (
        bins_y[None, :, None] * bin_h[:, None, None]
        + (iy[None, None, :] + 0.5) * (bin_h[:, None, None] / jnp.maximum(grid_h[:, None, None], 1.0))
        - roi_h[:, None, None] / 2
    )  # (N, PH, S)
    lx = (
        bins_x[None, :, None] * bin_w[:, None, None]
        + (iy[None, None, :] + 0.5) * (bin_w[:, None, None] / jnp.maximum(grid_w[:, None, None], 1.0))
        - roi_w[:, None, None] / 2
    )  # (N, PW, S)

    lyy = jnp.broadcast_to(ly[:, :, None, :, None], (n, ph, pw, s, s))
    lxx = jnp.broadcast_to(lx[:, None, :, None, :], (n, ph, pw, s, s))
    c = cos_t[:, None, None, None, None]
    si = sin_t[:, None, None, None, None]
    # rotate local coords CCW into image frame, matching the reference kernel
    # (ROIAlignRotated_cpu.cpp:62-63): y = ly*cos - lx*sin + cy ; x = ly*sin + lx*cos + cx
    yy = lyy * c - lxx * si + cy[:, None, None, None, None]
    xx = lyy * si + lxx * c + cx[:, None, None, None, None]
    bb = jnp.broadcast_to(batch_idx[:, None, None, None, None], (n, ph, pw, s, s))

    vals = _bilinear_gather(features, bb, yy, xx)
    sample_valid = (
        (iy[None, :, None] < grid_h[:, None, None]) & (iy[None, None, :] < grid_w[:, None, None])
    )
    w_mask = sample_valid[:, None, None, :, :, None].astype(vals.dtype)
    count = jnp.maximum(grid_h * grid_w, 1.0)[:, None, None, None]
    return jnp.sum(vals * w_mask, axis=(3, 4)) / count


@partial(
    jax.jit,
    static_argnames=("output_size", "spatial_scale", "sampling_ratio", "max_grid", "roi_chunk"),
)
def roi_align_rotated(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: Tuple[int, int],
    spatial_scale: float = 1.0,
    sampling_ratio: int = 0,
    max_grid: int = 8,
    roi_chunk: int = 128,
) -> jnp.ndarray:
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    n = rois.shape[0]
    if n == 0:
        return jnp.zeros((0, *output_size, features.shape[-1]), features.dtype)
    if n <= roi_chunk:
        return _roi_align_rotated_chunk(features, rois, output_size, spatial_scale, sampling_ratio, max_grid)
    pad = (-n) % roi_chunk
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    chunks = rois_p.reshape(-1, roi_chunk, 6)
    out = jax.lax.map(
        lambda r: _roi_align_rotated_chunk(features, r, output_size, spatial_scale, sampling_ratio, max_grid),
        chunks,
    )
    return out.reshape(-1, *output_size, features.shape[-1])[:n]


class ROIAlign:
    """Module-style wrapper (API parity with detectron2/layers/roi_align.py:9-50)."""

    def __init__(self, output_size, spatial_scale, sampling_ratio, aligned=True):
        self.output_size = output_size if isinstance(output_size, tuple) else (output_size, output_size)
        self.spatial_scale = spatial_scale
        self.sampling_ratio = sampling_ratio
        self.aligned = aligned

    def __call__(self, features, rois):
        return roi_align(
            features, rois, self.output_size, self.spatial_scale, self.sampling_ratio, self.aligned
        )


class ROIAlignRotated:
    def __init__(self, output_size, spatial_scale, sampling_ratio):
        self.output_size = output_size if isinstance(output_size, tuple) else (output_size, output_size)
        self.spatial_scale = spatial_scale
        self.sampling_ratio = sampling_ratio

    def __call__(self, features, rois):
        return roi_align_rotated(
            features, rois, self.output_size, self.spatial_scale, self.sampling_ratio
        )
