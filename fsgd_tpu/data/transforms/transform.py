"""Deterministic image/geometry transforms.

Role of fvcore.transforms + detectron2/data/transforms/transform.py: each
``Transform`` maps images, coordinates, boxes, polygons and segmentation maps
consistently.  Host-side numpy/cv2 (these run in the input pipeline, not on
TPU; the device-side work is normalization/padding inside the jitted step).
"""

from __future__ import annotations

from typing import List, Sequence

import cv2
import numpy as np

__all__ = [
    "Transform",
    "TransformList",
    "NoOpTransform",
    "HFlipTransform",
    "ResizeTransform",
    "CropTransform",
    "ExtentTransform",
    "BlendTransform",
]


class Transform:
    def apply_image(self, img: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def apply_box(self, box: np.ndarray) -> np.ndarray:
        """xyxy boxes (N, 4): transform the 4 corners, take the new envelope."""
        box = np.asarray(box, dtype=np.float64).reshape(-1, 4)
        idxs = np.array([(0, 1), (2, 1), (0, 3), (2, 3)]).flatten()
        coords = box[:, idxs].reshape(-1, 2)
        coords = self.apply_coords(coords).reshape(-1, 4, 2)
        minxy = coords.min(axis=1)
        maxxy = coords.max(axis=1)
        return np.concatenate((minxy, maxxy), axis=1)

    def apply_polygons(self, polygons: List[np.ndarray]) -> List[np.ndarray]:
        return [self.apply_coords(np.asarray(p, dtype=np.float64).reshape(-1, 2)).reshape(-1) for p in polygons]

    def apply_segmentation(self, segmentation: np.ndarray) -> np.ndarray:
        return self.apply_image(segmentation)

    def __add__(self, other: "Transform") -> "TransformList":
        return TransformList([self]) + other


class TransformList(Transform):
    def __init__(self, transforms: Sequence[Transform]):
        flat = []
        for t in transforms:
            if isinstance(t, TransformList):
                flat.extend(t.transforms)
            else:
                flat.append(t)
        self.transforms = flat

    def apply_image(self, img):
        for t in self.transforms:
            img = t.apply_image(img)
        return img

    def apply_coords(self, coords):
        for t in self.transforms:
            coords = t.apply_coords(coords)
        return coords

    def apply_segmentation(self, seg):
        for t in self.transforms:
            seg = t.apply_segmentation(seg)
        return seg

    def __add__(self, other):
        others = other.transforms if isinstance(other, TransformList) else [other]
        return TransformList(self.transforms + others)

    def __len__(self):
        return len(self.transforms)

    def __getitem__(self, i):
        return self.transforms[i]


class NoOpTransform(Transform):
    def apply_image(self, img):
        return img

    def apply_coords(self, coords):
        return coords


class HFlipTransform(Transform):
    def __init__(self, width: int):
        self.width = width

    def apply_image(self, img):
        return np.ascontiguousarray(img[:, ::-1])

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] = self.width - coords[:, 0]
        return coords


class ResizeTransform(Transform):
    def __init__(self, h: int, w: int, new_h: int, new_w: int, interp: int = cv2.INTER_LINEAR):
        self.h, self.w = h, w
        self.new_h, self.new_w = new_h, new_w
        self.interp = interp

    def apply_image(self, img, interp=None):
        assert img.shape[:2] == (self.h, self.w), (img.shape, self.h, self.w)
        interp = interp if interp is not None else self.interp
        return cv2.resize(img, (self.new_w, self.new_h), interpolation=interp)

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] *= self.new_w / self.w
        coords[:, 1] *= self.new_h / self.h
        return coords

    def apply_segmentation(self, seg):
        return self.apply_image(seg, interp=cv2.INTER_NEAREST)


class CropTransform(Transform):
    def __init__(self, x0: int, y0: int, w: int, h: int):
        self.x0, self.y0, self.w, self.h = x0, y0, w, h

    def apply_image(self, img):
        return img[self.y0 : self.y0 + self.h, self.x0 : self.x0 + self.w]

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] -= self.x0
        coords[:, 1] -= self.y0
        return coords

    def apply_polygons(self, polygons):
        # crop polygons by clipping coordinates to the crop box (approximate,
        # same as the reference CropTransform's polygon clipping fallback)
        out = []
        for p in polygons:
            c = self.apply_coords(np.asarray(p, np.float64).reshape(-1, 2))
            c[:, 0] = np.clip(c[:, 0], 0, self.w)
            c[:, 1] = np.clip(c[:, 1], 0, self.h)
            out.append(c.reshape(-1))
        return out


class ExtentTransform(Transform):
    """Crop a sub-rect (possibly out of bounds, zero-filled) and resize
    (reference data/transforms/transform.py ExtentTransform)."""

    def __init__(self, src_rect, output_size, interp=cv2.INTER_LINEAR, fill=0):
        self.src_rect = src_rect  # (x0, y0, x1, y1)
        self.output_size = output_size  # (h, w)
        self.interp = interp
        self.fill = fill

    def apply_image(self, img, interp=None):
        h, w = self.output_size
        x0, y0, x1, y1 = self.src_rect
        src_w = max(x1 - x0, 1e-6)
        src_h = max(y1 - y0, 1e-6)
        m = np.array(
            [[w / src_w, 0, -x0 * w / src_w], [0, h / src_h, -y0 * h / src_h]], dtype=np.float64
        )
        return cv2.warpAffine(
            img, m, (int(w), int(h)),
            flags=interp if interp is not None else self.interp,
            borderMode=cv2.BORDER_CONSTANT, borderValue=self.fill,
        )

    def apply_coords(self, coords):
        x0, y0, x1, y1 = self.src_rect
        h, w = self.output_size
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] = (coords[:, 0] - x0) * (w / max(x1 - x0, 1e-6))
        coords[:, 1] = (coords[:, 1] - y0) * (h / max(y1 - y0, 1e-6))
        return coords

    def apply_segmentation(self, seg):
        return self.apply_image(seg, interp=cv2.INTER_NEAREST)


class BlendTransform(Transform):
    """img = src_weight * src_image + dst_weight * img (photometric ops)."""

    def __init__(self, src_image, src_weight: float, dst_weight: float):
        self.src_image = src_image
        self.src_weight = src_weight
        self.dst_weight = dst_weight

    def apply_image(self, img):
        img = img.astype(np.float32)
        out = self.src_weight * self.src_image + self.dst_weight * img
        if np.issubdtype(np.asarray(self.src_image).dtype, np.integer):
            out = np.clip(out, 0, 255)
        return out

    def apply_coords(self, coords):
        return coords

    def apply_segmentation(self, seg):
        return seg
