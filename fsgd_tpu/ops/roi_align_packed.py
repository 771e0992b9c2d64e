"""ROIAlign as windowed separable matmuls over a packed feature pyramid.

The gather formulation of ROIAlign (roi_align.py) is exact but lowers to
millions of random 256-channel gathers — HBM-unfriendly and ~25x off
speed-of-light on TPU.  This module is the TPU-native production path:

1. All FPN levels are packed into ONE (B, R_total, W_max, C) buffer (levels
   stacked along rows with zero separator rows).
2. Each roi reads a *static-size* (Wd, Wd, C) window — a contiguous DMA, not
   a gather.
3. Bilinear ROIAlign is separable: pooled = Wy @ window @ Wx^T where
   Wy (P, Wd) / Wx (P, Wd) carry each output bin's per-row/column
   interpolation weights (sample average folded in).  Two small matmuls per
   roi run on the MXU.

On TPU the window read + contraction run as ONE fused Pallas kernel
(ops/pallas_roi_align.py: per-roi DMA into VMEM, matmuls, write the pooled
tile — no materialized windows); elsewhere an XLA gather + batched einsum
computes the same thing.

Exactness: identical to ROIAlignV2 whenever the roi's span at its assigned
level fits in the window (guaranteed by FPN's canonical level assignment for
aspect ratios up to Wd/pool_size; pathological slivers clamp to the window
edge).  Border semantics follow the reference (clamp into [0, size-1], drop
samples beyond +-1).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pack_feature_pyramid", "roi_align_packed"]


def pack_feature_pyramid(features: List[jnp.ndarray], window: int):
    """Stack per-level NHWC maps along rows with ``window`` zero rows of
    separation/padding per level.

    Returns (packed (B, R, Wmax, C), row_offsets (L,), heights (L,), widths (L,)).
    """
    b = features[0].shape[0]
    c = features[0].shape[-1]
    w_max = max(f.shape[2] for f in features)
    offsets, heights, widths = [], [], []
    rows = 0
    padded = []
    for f in features:
        h, w = f.shape[1], f.shape[2]
        offsets.append(rows)
        heights.append(h)
        widths.append(w)
        block_rows = h + window  # zero tail so windows never read the next level
        # +8 column slack: window column origins are rounded down to sublane
        # (8) multiples for the Pallas DMA
        pf = jnp.pad(f, ((0, 0), (0, block_rows - h), (0, w_max - w + window + 8), (0, 0)))
        padded.append(pf)
        rows += block_rows
    packed = jnp.concatenate(padded, axis=1)
    return packed, np.asarray(offsets), np.asarray(heights), np.asarray(widths)


def _interp_weights(samples: jnp.ndarray, valid: jnp.ndarray, start: jnp.ndarray, size: jnp.ndarray, window: int):
    """Per-bin linear-interpolation weights onto window rows.

    samples: (P, S) continuous coords (level-local); valid: (P, S) sample
    validity; start: scalar window origin; size: scalar level extent.
    Returns (P, window) weights (sum over samples; caller averages).
    """
    s = jnp.clip(samples, 0.0, jnp.maximum(size - 1.0, 0.0))
    rows = jnp.arange(window, dtype=jnp.float32)[None, None, :]  # (1, 1, Wd)
    local = s[..., None] - start  # (P, S, 1) -> (P, S, Wd)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(local - rows))
    w = w * valid[..., None]
    return jnp.sum(w, axis=1)  # (P, Wd)


def _window_meta(
    batch_idx, boxes, levels, row_offsets, heights, widths, scales, ph, pw, grid, window, aligned,
    adaptive=False,
):
    """Vectorized per-roi window origins + interpolation banks.

    Returns starts (N, 3) int32, wy (N, PH, Wd), wx (N, PW, Wd); the
    per-sample average is folded into the banks (wy carries 1/grid_h, wx
    1/grid_w).  With ``adaptive`` (reference ``sampling_ratio=0``), each
    roi uses ceil(bin) samples per side — traced per roi, statically
    bounded by ``grid`` — matching the reference CUDA kernel's adaptive
    grid (detectron2/layers/csrc/ROIAlign/ROIAlign_cpu.cpp:184-187);
    zero-size rois keep grid 0 -> zero output (reference count semantics).
    """
    scale = scales[levels]
    h_l = heights[levels].astype(jnp.float32)
    w_l = widths[levels].astype(jnp.float32)
    row0 = row_offsets[levels]

    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 0] * scale - offset
    y1 = boxes[:, 1] * scale - offset
    x2 = boxes[:, 2] * scale - offset
    y2 = boxes[:, 3] * scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_h = roi_h / ph
    bin_w = roi_w / pw

    s = grid
    iy = jnp.arange(s, dtype=jnp.float32)
    if adaptive:
        grid_h = jnp.clip(jnp.ceil(bin_h), 0.0, float(s))  # (N,)
        grid_w = jnp.clip(jnp.ceil(bin_w), 0.0, float(s))
    else:
        grid_h = jnp.full_like(bin_h, float(s))
        grid_w = jnp.full_like(bin_w, float(s))
    gh = jnp.maximum(grid_h, 1.0)
    gw = jnp.maximum(grid_w, 1.0)
    bins_y = jnp.arange(ph, dtype=jnp.float32)
    bins_x = jnp.arange(pw, dtype=jnp.float32)
    sy = y1[:, None, None] + bins_y[None, :, None] * bin_h[:, None, None] + (
        iy[None, None, :] + 0.5
    ) * (bin_h[:, None, None] / gh[:, None, None])
    sx = x1[:, None, None] + bins_x[None, :, None] * bin_w[:, None, None] + (
        iy[None, None, :] + 0.5
    ) * (bin_w[:, None, None] / gw[:, None, None])
    vy = (sy > -1.0) & (sy < h_l[:, None, None]) & (iy[None, None, :] < grid_h[:, None, None])
    vx = (sx > -1.0) & (sx < w_l[:, None, None]) & (iy[None, None, :] < grid_w[:, None, None])

    wy0 = jnp.clip(jnp.floor(y1), 0.0, jnp.maximum(h_l - 1.0, 0.0)).astype(jnp.int32)
    wx0 = jnp.clip(jnp.floor(x1), 0.0, jnp.maximum(w_l - 1.0, 0.0)).astype(jnp.int32)
    # column origins rounded to sublane (8) multiples; the window is 8 wider
    wx0 = (wx0 // 8) * 8

    wy = jax.vmap(_interp_weights, in_axes=(0, 0, 0, 0, None))(
        sy, vy.astype(jnp.float32), wy0.astype(jnp.float32), h_l, window
    ) / gh[:, None, None]
    wx = jax.vmap(_interp_weights, in_axes=(0, 0, 0, 0, None))(
        sx, vx.astype(jnp.float32), wx0.astype(jnp.float32), w_l, window + 8
    ) / gw[:, None, None]
    starts = jnp.stack([batch_idx, row0 + wy0, wx0], axis=1)
    return starts, wy, wx


def _xla_windows(packed, starts, wy, wx, window, chunk):
    """Gather windows + batched einsums (the non-Pallas fallback)."""
    c = packed.shape[-1]
    n = starts.shape[0]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,), start_index_map=(0, 1, 2)
    )

    def run(args):
        st, wy_c, wx_c = args
        windows = jax.lax.gather(
            packed, st, dnums, slice_sizes=(1, window, window + 8, c),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
        out = jnp.einsum(
            "npw,nwvc->npvc", wy_c, windows.astype(jnp.float32), preferred_element_type=jnp.float32
        )
        return jnp.einsum("npvc,nqv->npqc", out, wx_c, preferred_element_type=jnp.float32)

    chunk = min(chunk, n)
    pad = (-n) % chunk
    if pad:
        starts = jnp.pad(starts, ((0, pad), (0, 0)))
        wy = jnp.pad(wy, ((0, pad), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, pad), (0, 0), (0, 0)))
    out = jax.lax.map(
        run,
        (
            starts.reshape(-1, chunk, 3),
            wy.reshape(-1, chunk, *wy.shape[1:]),
            wx.reshape(-1, chunk, *wx.shape[1:]),
        ),
    )
    ph = wy.shape[1]
    return out.reshape(-1, ph, ph, c)[:n]


@partial(
    jax.jit,
    static_argnames=("output_size", "grid", "window", "aligned", "roi_chunk", "strides", "adaptive"),
)
def roi_align_packed(
    features_tuple: Tuple[jnp.ndarray, ...],
    boxes: jnp.ndarray,  # (B, P, 4) xyxy
    levels: jnp.ndarray,  # (B, P) int32 index into the level list
    strides: Tuple[int, ...],
    output_size: Tuple[int, int],
    grid: int = 2,
    window: int = 48,
    aligned: bool = True,
    roi_chunk: int = 512,
    adaptive: bool = False,
) -> jnp.ndarray:
    """Multi-level ROIAlign over a packed pyramid.  Returns (B, P, PH, PW, C)."""
    ph, pw = output_size
    assert ph == pw, "square pooling only"
    b, p = boxes.shape[:2]
    # The window never needs to exceed the largest level extent (+2 bilinear
    # slack, rounded up to the sublane multiple of 8): production pyramids
    # keep the configured window; tiny images shrink it, cutting the
    # gather/scatter volume quadratically.
    max_extent = max(max(f.shape[1], f.shape[2]) for f in features_tuple)
    window = max(8, min(window, -(-(max_extent + 2) // 8) * 8))
    packed, row_offsets, heights, widths = pack_feature_pyramid(list(features_tuple), window)
    row_offsets = jnp.asarray(row_offsets, jnp.int32)
    heights_a = jnp.asarray(heights, jnp.int32)
    widths_a = jnp.asarray(widths, jnp.int32)
    scales = jnp.asarray([1.0 / s for s in strides], jnp.float32)

    flat_boxes = jax.lax.stop_gradient(boxes.reshape(b * p, 4))
    flat_levels = levels.reshape(b * p)
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)

    starts, wy, wx = _window_meta(
        batch_idx, flat_boxes, flat_levels,
        row_offsets, heights_a, widths_a, scales,
        ph, pw, grid, window, aligned, adaptive,
    )

    if jax.default_backend() == "tpu":
        w_small = 32
        if window > w_small:
            # Bucketed two-pass kernel: the 48-cell window exists only for
            # extreme-aspect rois; pooling every roi through it moves ~5x the
            # necessary HBM bytes (see pallas_roi_align.py).  Rois whose
            # clipped span fits the small window are exact in pass 1; the
            # rest pool through the original large window in pass 2 (each
            # pass compacted to a grid prefix, so both stay double-buffered).
            from .pallas_roi_align import roi_align_windows_bucketed

            scale_pb = scales[flat_levels]
            offset = 0.5 if aligned else 0.0
            bx1 = flat_boxes[:, 0] * scale_pb - offset
            by1 = flat_boxes[:, 1] * scale_pb - offset
            roi_w = flat_boxes[:, 2] * scale_pb - offset - bx1
            roi_h = flat_boxes[:, 3] * scale_pb - offset - by1
            if not aligned:
                roi_w = jnp.maximum(roi_w, 1.0)
                roi_h = jnp.maximum(roi_h, 1.0)
            h_lf = heights_a[flat_levels].astype(jnp.float32)
            w_lf = widths_a[flat_levels].astype(jnp.float32)
            small = (jnp.minimum(roi_h, h_lf) <= w_small - 2) & (
                jnp.minimum(roi_w, w_lf) <= w_small - 1
            )
            starts_s, wy_s, wx_s = _window_meta(
                batch_idx, flat_boxes, flat_levels,
                row_offsets, heights_a, widths_a, scales,
                ph, pw, grid, w_small, aligned, adaptive,
            )
            out = roi_align_windows_bucketed(
                packed, starts_s, wy_s, wx_s, starts, wy, wx, small,
                w_small, window, ph,
            )
        else:
            from .pallas_roi_align import roi_align_windows_pallas

            out = roi_align_windows_pallas(packed, starts, wy, wx, window, ph)
    else:
        out = _xla_windows(packed, starts, wy, wx, window, roi_chunk)
    return out.reshape(b, p, ph, pw, -1)
