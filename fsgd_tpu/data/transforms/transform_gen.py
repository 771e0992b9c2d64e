"""Random transform generators.

Parity with detectron2/data/transforms/transform_gen.py:22-445:
``TransformGen`` + ``RandomFlip``, ``Resize``, ``ResizeShortestEdge``,
``RandomCrop`` (relative/relative_range/absolute), ``RandomExtent``,
``RandomBrightness/Contrast/Saturation/Lighting``, ``apply_transform_gens``.
"""

from __future__ import annotations

import sys
from typing import List, Tuple

import numpy as np

from .transform import (
    BlendTransform,
    CropTransform,
    ExtentTransform,
    HFlipTransform,
    NoOpTransform,
    ResizeTransform,
    Transform,
    TransformList,
)

__all__ = [
    "TransformGen",
    "RandomFlip",
    "Resize",
    "ResizeShortestEdge",
    "RandomCrop",
    "RandomExtent",
    "RandomBrightness",
    "RandomContrast",
    "RandomSaturation",
    "RandomLighting",
    "apply_transform_gens",
]


class TransformGen:
    """Samples a deterministic Transform given the image."""

    def get_transform(self, img: np.ndarray) -> Transform:
        raise NotImplementedError

    def _rand_range(self, low=1.0, high=None, size=None):
        if high is None:
            low, high = 0, low
        if size is None:
            size = []
        return np.random.uniform(low, high, size)

    def __repr__(self):
        return self.__class__.__name__


class RandomFlip(TransformGen):
    def __init__(self, prob: float = 0.5):
        self.prob = prob

    def get_transform(self, img):
        h, w = img.shape[:2]
        if self._rand_range() < self.prob:
            return HFlipTransform(w)
        return NoOpTransform()


class Resize(TransformGen):
    def __init__(self, shape, interp=None):
        if isinstance(shape, int):
            shape = (shape, shape)
        self.shape = tuple(shape)
        self.interp = interp

    def get_transform(self, img):
        return ResizeTransform(img.shape[0], img.shape[1], self.shape[0], self.shape[1])


class ResizeShortestEdge(TransformGen):
    """Scale the shorter side to one of ``short_edge_length`` capped by
    ``max_size`` (the reference's standard train/test resize)."""

    def __init__(self, short_edge_length, max_size=sys.maxsize, sample_style="choice"):
        assert sample_style in ["range", "choice"], sample_style
        self.is_range = sample_style == "range"
        if isinstance(short_edge_length, int):
            short_edge_length = (short_edge_length, short_edge_length)
        self.short_edge_length = short_edge_length
        self.max_size = max_size

    def get_transform(self, img):
        h, w = img.shape[:2]
        if self.is_range:
            size = np.random.randint(self.short_edge_length[0], self.short_edge_length[1] + 1)
        else:
            size = np.random.choice(self.short_edge_length)
        if size == 0:
            return NoOpTransform()

        scale = size * 1.0 / min(h, w)
        if h < w:
            newh, neww = size, scale * w
        else:
            newh, neww = scale * h, size
        if max(newh, neww) > self.max_size:
            scale = self.max_size * 1.0 / max(newh, neww)
            newh = newh * scale
            neww = neww * scale
        neww = int(neww + 0.5)
        newh = int(newh + 0.5)
        return ResizeTransform(h, w, newh, neww)


class RandomCrop(TransformGen):
    def __init__(self, crop_type: str, crop_size):
        assert crop_type in ["relative_range", "relative", "absolute"]
        self.crop_type = crop_type
        self.crop_size = crop_size

    def get_transform(self, img):
        h, w = img.shape[:2]
        croph, cropw = self.get_crop_size((h, w))
        assert h >= croph and w >= cropw, "Shape computation has bugs."
        h0 = np.random.randint(h - croph + 1)
        w0 = np.random.randint(w - cropw + 1)
        return CropTransform(w0, h0, cropw, croph)

    def get_crop_size(self, image_size) -> Tuple[int, int]:
        h, w = image_size
        if self.crop_type == "relative":
            ch, cw = self.crop_size
            return int(h * ch + 0.5), int(w * cw + 0.5)
        if self.crop_type == "relative_range":
            crop_size = np.asarray(self.crop_size, dtype=np.float32)
            ch, cw = crop_size + np.random.rand(2) * (1 - crop_size)
            return int(h * ch + 0.5), int(w * cw + 0.5)
        return (min(self.crop_size[0], h), min(self.crop_size[1], w))


class RandomExtent(TransformGen):
    def __init__(self, scale_range, shift_range):
        self.scale_range = scale_range
        self.shift_range = shift_range

    def get_transform(self, img):
        img_h, img_w = img.shape[:2]
        src_rect = np.array([-0.5 * img_w, -0.5 * img_h, 0.5 * img_w, 0.5 * img_h])
        src_rect *= np.random.uniform(self.scale_range[0], self.scale_range[1])
        src_rect[0::2] += self.shift_range[0] * img_w * (np.random.rand() - 0.5)
        src_rect[1::2] += self.shift_range[1] * img_h * (np.random.rand() - 0.5)
        src_rect[0::2] += 0.5 * img_w
        src_rect[1::2] += 0.5 * img_h
        return ExtentTransform(
            src_rect=(src_rect[0], src_rect[1], src_rect[2], src_rect[3]),
            output_size=(int(src_rect[3] - src_rect[1]), int(src_rect[2] - src_rect[0])),
        )


class RandomBrightness(TransformGen):
    def __init__(self, intensity_min, intensity_max):
        self.intensity_min = intensity_min
        self.intensity_max = intensity_max

    def get_transform(self, img):
        w = np.random.uniform(self.intensity_min, self.intensity_max)
        return BlendTransform(src_image=0, src_weight=1 - w, dst_weight=w)


class RandomContrast(TransformGen):
    def __init__(self, intensity_min, intensity_max):
        self.intensity_min = intensity_min
        self.intensity_max = intensity_max

    def get_transform(self, img):
        w = np.random.uniform(self.intensity_min, self.intensity_max)
        return BlendTransform(src_image=img.mean(), src_weight=1 - w, dst_weight=w)


class RandomSaturation(TransformGen):
    def __init__(self, intensity_min, intensity_max):
        self.intensity_min = intensity_min
        self.intensity_max = intensity_max

    def get_transform(self, img):
        assert img.shape[-1] == 3, "Saturation only works on RGB images"
        w = np.random.uniform(self.intensity_min, self.intensity_max)
        grayscale = img.dot([0.299, 0.587, 0.114])[:, :, np.newaxis]
        return BlendTransform(src_image=grayscale, src_weight=1 - w, dst_weight=w)


class RandomLighting(TransformGen):
    """AlexNet-style PCA lighting jitter."""

    def __init__(self, scale):
        self.scale = scale
        self.eigen_vecs = np.array(
            [[-0.5675, 0.7192, 0.4009], [-0.5808, -0.0045, -0.8140], [-0.5836, -0.6948, 0.4203]]
        )
        self.eigen_vals = np.array([0.2175, 0.0188, 0.0045])

    def get_transform(self, img):
        assert img.shape[-1] == 3
        weights = np.random.normal(scale=self.scale, size=3)
        return BlendTransform(
            src_image=self.eigen_vecs.dot(weights * self.eigen_vals), src_weight=1.0, dst_weight=1.0
        )


def apply_transform_gens(transform_gens: List[TransformGen], img: np.ndarray):
    """Apply gens in order; returns (transformed image, TransformList)."""
    tfms = []
    for g in transform_gens:
        assert isinstance(g, (TransformGen, Transform)), g
        tfm = g.get_transform(img) if isinstance(g, TransformGen) else g
        img = tfm.apply_image(img)
        tfms.append(tfm)
    return img, TransformList(tfms)
