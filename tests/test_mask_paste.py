"""Mask crop/paste roundtrip precision.

Parity with the reference's tests/test_mask_ops.py TestMaskCropPaste: crop a
full-image ground-truth bitmask to the fixed mask size through the GT-crop
path, paste it back through paste_masks_in_image, and require high IoU with
the original — the end-to-end precision contract of the mask branch.
"""

import numpy as np

from fsgd_tpu.ops.paste_masks import paste_mask_in_image_np, paste_masks_in_image
from fsgd_tpu.structures.masks import polygons_to_bitmask, rasterize_polygons_within_box


def _iou(a, b):
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return inter / max(union, 1)


def _polygon_circle(cx, cy, r, k=64):
    ang = np.linspace(0, 2 * np.pi, k, endpoint=False)
    pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
    return [pts.reshape(-1)]


class TestMaskCropPaste:
    def test_crop_paste_roundtrip_iou(self):
        """reference tests/test_mask_ops.py:69-104 (uses COCO polygons; here a
        dense synthetic polygon at several scales/offsets)."""
        img_h = img_w = 160
        for mask_size in (28, 56):
            for (cx, cy, r) in [(80, 80, 50), (40, 60, 22), (120, 100, 31.5)]:
                poly = _polygon_circle(cx, cy, r)
                full = polygons_to_bitmask(poly, img_h, img_w)
                box = np.array(
                    [cx - r - 2, cy - r - 2, cx + r + 2, cy + r + 2], np.float32
                )
                crop = rasterize_polygons_within_box(poly, box, mask_size)
                pasted = paste_mask_in_image_np(
                    np.asarray(crop, np.float32), box, img_h, img_w
                )
                iou = _iou(pasted, full)
                assert iou > 0.93, (mask_size, (cx, cy, r), iou)

    def test_paste_clipping_and_empty(self):
        mask = np.ones((28, 28), np.float32)
        # box partially outside the image clips instead of wrapping
        out = paste_mask_in_image_np(mask, np.array([-10, -10, 20, 20], np.float32), 64, 64)
        assert out[:20, :20].all() and not out[21:, :].any() and not out[:, 21:].any()
        # degenerate box -> empty
        out = paste_mask_in_image_np(mask, np.array([5, 5, 5, 5], np.float32), 64, 64)
        assert not out.any()

    def test_batched_matches_single(self):
        rng = np.random.RandomState(0)
        masks = rng.rand(4, 28, 28).astype(np.float32)
        boxes = np.array(
            [[3, 4, 40, 50], [10, 10, 30, 90], [0, 0, 64, 64], [50, 50, 63, 63]],
            np.float32,
        )
        batched = paste_masks_in_image(masks, boxes, (64, 64))
        for i in range(4):
            single = paste_mask_in_image_np(masks[i], boxes[i], 64, 64)
            np.testing.assert_array_equal(batched[i], single)
