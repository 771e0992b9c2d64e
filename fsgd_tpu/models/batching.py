"""Conversion between detectron2-style ``batched_inputs`` (list of per-image
dicts) and the TPU-native padded batch dict.

The native format is the static-shape contract every jitted step consumes
(SURVEY.md section 7): images padded into a fixed bucket, GT padded to
``MAX_GT`` with a validity mask.

batch = {
    "image":      (B, H, W, 3) float32, raw pixels in cfg INPUT.FORMAT order,
    "image_size": (B, 2) int32 true (h, w) inside the padded canvas,
    "out_size":   (B, 2) int32 desired output (h, w) for postprocess rescale,
    "gt_boxes":   (B, G, 4) float32 xyxy,
    "gt_classes": (B, G) int32,
    "gt_valid":   (B, G) bool,
}
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["batched_inputs_to_batch", "pick_bucket"]


def pick_bucket(h: int, w: int, buckets: Sequence[Tuple[int, int]], divisibility: int = 32):
    """Smallest-area bucket that fits (h, w); falls back to rounded exact size."""
    fitting = [(bh, bw) for bh, bw in buckets if bh >= h and bw >= w]
    if fitting:
        return min(fitting, key=lambda s: s[0] * s[1])
    rh = (h + divisibility - 1) // divisibility * divisibility
    rw = (w + divisibility - 1) // divisibility * divisibility
    return (rh, rw)


def batched_inputs_to_batch(
    batched_inputs: List[Dict],
    max_gt: int = 100,
    size_divisibility: int = 32,
    pad_to: Optional[Tuple[int, int]] = None,
    buckets: Optional[Sequence[Tuple[int, int]]] = None,
) -> Dict[str, np.ndarray]:
    """Convert reference-style inputs into the native padded batch dict.

    Each input dict may contain "image" ((H, W, 3) or (3, H, W) array),
    "instances" (an Instances with gt_boxes/gt_classes), and "height"/"width"
    (desired output resolution).
    """
    images = []
    for x in batched_inputs:
        img = np.asarray(x["image"], dtype=np.float32)
        if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[0] < img.shape[2]:
            img = np.transpose(img, (1, 2, 0))  # CHW -> HWC
        images.append(img)

    max_h = max(im.shape[0] for im in images)
    max_w = max(im.shape[1] for im in images)
    if pad_to is None and buckets is not None:
        pad_to = pick_bucket(max_h, max_w, buckets, size_divisibility)
    if pad_to is None:
        pad_to = (
            (max_h + size_divisibility - 1) // size_divisibility * size_divisibility,
            (max_w + size_divisibility - 1) // size_divisibility * size_divisibility,
        )

    b = len(images)
    canvas = np.zeros((b, pad_to[0], pad_to[1], images[0].shape[2]), dtype=np.float32)
    image_size = np.zeros((b, 2), dtype=np.int32)
    out_size = np.zeros((b, 2), dtype=np.int32)
    gt_boxes = np.zeros((b, max_gt, 4), dtype=np.float32)
    gt_classes = np.zeros((b, max_gt), dtype=np.int32)
    gt_valid = np.zeros((b, max_gt), dtype=bool)

    for i, (x, img) in enumerate(zip(batched_inputs, images)):
        h, w = img.shape[:2]
        canvas[i, :h, :w] = img
        image_size[i] = (h, w)
        out_size[i] = (int(x.get("height", h)), int(x.get("width", w)))
        inst = x.get("instances", None)
        if inst is not None and len(inst) > 0:
            boxes = np.asarray(inst.gt_boxes.tensor if hasattr(inst.gt_boxes, "tensor") else inst.gt_boxes)
            classes = np.asarray(inst.gt_classes)
            n = min(len(classes), max_gt)
            gt_boxes[i, :n] = boxes[:n]
            gt_classes[i, :n] = classes[:n]
            gt_valid[i, :n] = True

    return {
        "image": canvas,
        "image_size": image_size,
        "out_size": out_size,
        "gt_boxes": gt_boxes,
        "gt_classes": gt_classes,
        "gt_valid": gt_valid,
    }
