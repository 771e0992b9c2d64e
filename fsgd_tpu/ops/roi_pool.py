"""RoIPool: quantized-bin max pooling (Fast R-CNN).

Parity target: detectron2/modeling/poolers.py:95-100 ("ROIPool" pooler type,
backed by torchvision.ops.RoIPool) with Caffe2 semantics: roi corners are
rounded to the feature grid, each of the PH x PW bins max-pools the integer
cells in [floor(p*bin), ceil((p+1)*bin)).

TPU design: the dynamic per-bin extents become a static G-point integer
sampling grid per bin axis — positions floor(start + j*extent/G) with step
extent/G <= 1 visit every integer cell, so the result is EXACT whenever the
bin spans at most ``grid`` cells (the FPN level assignment guarantees ~2
cells/bin; standalone use should raise ``grid`` for very large rois).  One
batched gather + max per chunk; no data-dependent shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["roi_pool"]


def roi_pool(
    features: jnp.ndarray,  # (N, H, W, C)
    rois: jnp.ndarray,  # (R, 5): batch_idx, x1, y1, x2, y2 (input coords)
    output_size: Tuple[int, int],
    spatial_scale: float,
    grid: int = 4,
    roi_chunk: int = 512,
) -> jnp.ndarray:
    """Returns (R, PH, PW, C) max-pooled crops."""
    features = jnp.asarray(features)
    rois = jnp.asarray(rois)
    n, h, w, c = features.shape
    ph, pw = output_size
    r = rois.shape[0]

    batch_idx = rois[:, 0].astype(jnp.int32)
    # Caffe2 RoIPool: round roi corners onto the feature grid
    x1 = jnp.round(rois[:, 1] * spatial_scale)
    y1 = jnp.round(rois[:, 2] * spatial_scale)
    x2 = jnp.round(rois[:, 3] * spatial_scale)
    y2 = jnp.round(rois[:, 4] * spatial_scale)
    roi_w = jnp.maximum(x2 - x1 + 1.0, 1.0)
    roi_h = jnp.maximum(y2 - y1 + 1.0, 1.0)
    bin_w = roi_w / pw
    bin_h = roi_h / ph

    def bin_samples(start, bsz, p, size):
        """Integer sample positions for each bin: (R, P, G) plus validity."""
        lo = jnp.floor(p[None, :] * bsz[:, None])  # (R, P)
        hi = jnp.ceil((p[None, :] + 1.0) * bsz[:, None])
        lo_abs = jnp.clip(lo + start[:, None], 0.0, float(size))
        hi_abs = jnp.clip(hi + start[:, None], 0.0, float(size))
        extent = hi_abs - lo_abs  # (R, P), >= 0
        j = (jnp.arange(grid, dtype=jnp.float32) + 0.0)[None, None, :]
        pos = jnp.floor(lo_abs[..., None] + j * extent[..., None] / grid)
        pos = jnp.clip(pos, 0.0, float(size - 1)).astype(jnp.int32)
        empty = extent <= 0.0
        return pos, empty

    ys, y_empty = bin_samples(y1, bin_h, jnp.arange(ph, dtype=jnp.float32), h)  # (R,PH,G)
    xs, x_empty = bin_samples(x1, bin_w, jnp.arange(pw, dtype=jnp.float32), w)  # (R,PW,G)

    pad = (-r) % roi_chunk
    if pad:
        batch_idx = jnp.pad(batch_idx, (0, pad))
        ys = jnp.pad(ys, ((0, pad), (0, 0), (0, 0)))
        xs = jnp.pad(xs, ((0, pad), (0, 0), (0, 0)))
        y_empty = jnp.pad(y_empty, ((0, pad), (0, 0)))
        x_empty = jnp.pad(x_empty, ((0, pad), (0, 0)))
    rp = r + pad

    def chunk(args):
        bi, ysc, xsc, yec, xec = args
        k = bi.shape[0]
        # gather rows then columns: (K, PH, G, W, C) -> (K, PH, G, PW, G, C)
        rows = features[bi[:, None, None], ysc]  # (K, PH, G, W, C)
        vals = rows[
            jnp.arange(k)[:, None, None, None, None],
            jnp.arange(ph)[None, :, None, None, None],
            jnp.arange(grid)[None, None, :, None, None],
            xsc[:, None, None, :, :],
        ]  # (K, PH, G, PW, G, C)
        out = jnp.max(vals, axis=(2, 4))  # (K, PH, PW, C)
        empty = yec[:, :, None] | xec[:, None, :]  # (K, PH, PW)
        return jnp.where(empty[..., None], 0.0, out)

    chunks = jax.lax.map(
        chunk,
        (
            batch_idx.reshape(-1, roi_chunk),
            ys.reshape(-1, roi_chunk, ph, grid),
            xs.reshape(-1, roi_chunk, pw, grid),
            y_empty.reshape(-1, roi_chunk, ph),
            x_empty.reshape(-1, roi_chunk, pw),
        ),
    )
    return chunks.reshape(rp, ph, pw, c)[:r]
