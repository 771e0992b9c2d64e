"""Detection post-processing: rescale results to the output resolution.

Parity with detectron2/modeling/postprocessing.py:8-75
(``detector_postprocess`` and ``sem_seg_postprocess``).  The device variant
operates on padded detection dicts inside jit; the host variant mirrors the
reference's Instances-based API.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..structures import Boxes, Instances, RotatedBoxes

__all__ = ["detector_postprocess", "scale_detections", "sem_seg_postprocess"]


def scale_detections(dets: Dict[str, jnp.ndarray], image_size: jnp.ndarray, out_size: jnp.ndarray):
    """Rescale padded detections from network input space to output space.

    Args:
        dets: {"boxes": (B, D, 4), ...}
        image_size: (B, 2) true (h, w) inside the padded input.
        out_size: (B, 2) desired output (h, w).
    """
    scale_y = out_size[:, 0].astype(jnp.float32) / jnp.maximum(image_size[:, 0].astype(jnp.float32), 1.0)
    scale_x = out_size[:, 1].astype(jnp.float32) / jnp.maximum(image_size[:, 1].astype(jnp.float32), 1.0)

    if dets["boxes"].shape[-1] == 5:  # rotated boxes: anisotropic scale per RotatedBoxes.scale
        import jax

        def scale_one(b, sx, sy):
            return RotatedBoxes(b).scale(sx, sy).tensor

        out = dict(dets)
        out["boxes"] = jax.vmap(scale_one)(dets["boxes"], scale_x, scale_y)
        return out

    s = jnp.stack([scale_x, scale_y, scale_x, scale_y], axis=-1)[:, None, :]  # (B, 1, 4)
    boxes = dets["boxes"] * s
    if "mask_boxes" in dets:
        # TensorMask attaches masks to anchor boxes; scale them the same way
        dets = dict(dets)
        dets["mask_boxes"] = dets["mask_boxes"] * s
    # clip to the output canvas
    w = out_size[:, 1].astype(jnp.float32)[:, None]
    h = out_size[:, 0].astype(jnp.float32)[:, None]
    boxes = jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w),
            jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w),
            jnp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )
    out = dict(dets)
    out["boxes"] = boxes
    # drop now-empty boxes from validity (reference nonempty filter)
    nonempty = (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])
    out["valid"] = dets["valid"] & nonempty
    return out


def detector_postprocess(results: Instances, output_height: int, output_width: int) -> Instances:
    """Host-side Instances variant (reference postprocessing.py:8-55)."""
    in_h, in_w = results.image_size
    scale_x = output_width / in_w
    scale_y = output_height / in_h
    out = Instances((output_height, output_width), **results.get_fields())

    if out.has("pred_boxes"):
        boxes = out.pred_boxes
    elif out.has("proposal_boxes"):
        boxes = out.proposal_boxes
    else:
        boxes = None
    if boxes is not None:
        scaled = boxes.scale(scale_x, scale_y).clip((output_height, output_width))
        if out.has("pred_boxes"):
            out.pred_boxes = scaled
        else:
            out.proposal_boxes = scaled
        keep = np.asarray(scaled.nonempty())
        out = out[keep]

    if out.has("pred_keypoints"):
        kpts = jnp.asarray(out.pred_keypoints)
        kpts = kpts.at[..., 0].multiply(scale_x).at[..., 1].multiply(scale_y)
        out.pred_keypoints = kpts
    return out


def sem_seg_postprocess(result: jnp.ndarray, img_size: Tuple[int, int], output_height: int, output_width: int):
    """Crop the padded logits to the true size and resize to output size.

    result: (H, W, C) semantic logits over the padded canvas.
    """
    import jax

    result = result[: img_size[0], : img_size[1], :]
    return jax.image.resize(result, (output_height, output_width, result.shape[-1]), method="bilinear")
