"""Instance mask structures.

Parity with detectron2/structures/masks.py:21-418 (``BitMasks``,
``PolygonMasks``, ``polygons_to_bitmask``, ``rasterize_polygons_within_box``).
Rasterization runs on host with OpenCV (pycocotools is not a dependency);
``rasterize_polygons_within_box`` produces the fixed 28x28 GT crops used by
the mask loss, so it is exercised by the crop<->paste round-trip test
(reference tests/test_mask_ops.py:67).
"""

from __future__ import annotations

import itertools
from typing import Any, Iterator, List, Union

import cv2
import jax
import jax.numpy as jnp
import numpy as np


def polygon_area(x: np.ndarray, y: np.ndarray) -> float:
    """Shoelace formula (same as reference masks.py:21-26)."""
    return 0.5 * np.abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


def polygons_to_bitmask(polygons: List[np.ndarray], height: int, width: int) -> np.ndarray:
    """Rasterize polygons ([x0,y0,x1,y1,...] arrays) into a bool (H, W) mask.

    Matches COCO semantics closely: each polygon is filled; overlapping
    polygons of one instance are unioned.
    """
    assert isinstance(polygons, list)
    mask = np.zeros((height, width), dtype=np.uint8)
    if len(polygons) == 0:
        return mask.astype(bool)
    pts = [np.asarray(p, dtype=np.float64).reshape(-1, 2) for p in polygons]
    # COCO (pycocotools) rounds polygon vertices to the nearest integer grid.
    pts = [np.round(p).astype(np.int32) for p in pts if len(p) >= 3]
    if len(pts):
        cv2.fillPoly(mask, pts, 1)
    return mask.astype(bool)


def rasterize_polygons_within_box(
    polygons: List[np.ndarray], box: np.ndarray, mask_size: int
) -> np.ndarray:
    """Crop polygons by ``box`` and rasterize into (mask_size, mask_size) bool.

    Same transform as the reference (masks.py:36-82): translate by box origin,
    scale to mask_size, rasterize.
    """
    w, h = box[2] - box[0], box[3] - box[1]
    polygons = [np.asarray(p, dtype=np.float64).copy() for p in polygons]
    for p in polygons:
        p[0::2] = p[0::2] - box[0]
        p[1::2] = p[1::2] - box[1]
    ratio_h = mask_size / max(h, 0.1)
    ratio_w = mask_size / max(w, 0.1)
    for p in polygons:
        p[0::2] *= ratio_w
        p[1::2] *= ratio_h
    return polygons_to_bitmask(polygons, mask_size, mask_size)


@jax.tree_util.register_pytree_node_class
class BitMasks:
    """Masks as a (N, H, W) bool/uint8 array."""

    def __init__(self, tensor):
        tensor = jnp.asarray(tensor)
        if tensor.dtype != jnp.bool_:
            tensor = tensor.astype(jnp.bool_)
        assert tensor.ndim == 3, tensor.shape
        self.tensor = tensor
        self.image_size = tuple(int(x) for x in tensor.shape[1:])

    def tree_flatten(self):
        return (self.tensor,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.tensor = children[0]
        obj.image_size = tuple(int(x) for x in children[0].shape[1:]) if hasattr(children[0], "shape") else (0, 0)
        return obj

    def to(self, *args, **kwargs):
        return self

    def numpy(self):
        return np.asarray(self.tensor)

    def __getitem__(self, item) -> "BitMasks":
        if isinstance(item, int):
            return BitMasks(self.tensor[item][None])
        return BitMasks(self.tensor[item])

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __repr__(self) -> str:
        return "BitMasks(num_instances={})".format(len(self))

    def nonempty(self) -> jnp.ndarray:
        return self.tensor.reshape(self.tensor.shape[0], -1).any(axis=1)

    @staticmethod
    def from_polygon_masks(polygon_masks: Union["PolygonMasks", List[List[np.ndarray]]], height: int, width: int) -> "BitMasks":
        if isinstance(polygon_masks, PolygonMasks):
            polygon_masks = polygon_masks.polygons
        masks = [polygons_to_bitmask(p, height, width) for p in polygon_masks]
        if len(masks) == 0:
            return BitMasks(np.zeros((0, height, width), dtype=bool))
        return BitMasks(np.stack(masks))

    def crop_and_resize(self, boxes, mask_size: int) -> jnp.ndarray:
        """Crop each mask by its box and resize to (mask_size, mask_size).

        Used for GT preparation with bitmask annotations.  Implemented with
        the ROIAlign op so train-time GT matches the paste operation.
        """
        from ..ops.roi_align import roi_align

        boxes = boxes.tensor if hasattr(boxes, "tensor") else jnp.asarray(boxes)
        n = len(self)
        assert boxes.shape[0] == n, "{} != {}".format(boxes.shape[0], n)
        batch_inds = jnp.arange(n, dtype=jnp.float32)[:, None]
        rois = jnp.concatenate([batch_inds, boxes], axis=1)
        masks = self.tensor[:, :, :, None].astype(jnp.float32)  # (N, H, W, 1)
        output = roi_align(masks, rois, (mask_size, mask_size), 1.0, 0, True)
        return output[:, :, :, 0] >= 0.5

    def get_bounding_boxes(self):
        from .boxes import Boxes

        masks = np.asarray(self.tensor)
        n = masks.shape[0]
        boxes = np.zeros((n, 4), dtype=np.float32)
        for i in range(n):
            ys, xs = np.nonzero(masks[i])
            if len(xs):
                boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        return Boxes(boxes)

    @staticmethod
    def cat(bitmasks_list: List["BitMasks"]) -> "BitMasks":
        return BitMasks(jnp.concatenate([bm.tensor for bm in bitmasks_list], axis=0))


class PolygonMasks:
    """Host-side polygon masks: list (instances) of list (polygons) of arrays."""

    def __init__(self, polygons: List[List[Any]]):
        assert isinstance(polygons, list), type(polygons)

        def _make_array(t) -> np.ndarray:
            return np.asarray(t, dtype=np.float64)

        def process_polygons(polygons_per_instance) -> List[np.ndarray]:
            assert isinstance(polygons_per_instance, list), type(polygons_per_instance)
            polygons_per_instance = [_make_array(p) for p in polygons_per_instance]
            for polygon in polygons_per_instance:
                assert len(polygon) % 2 == 0 and len(polygon) >= 6
            return polygons_per_instance

        self.polygons: List[List[np.ndarray]] = [process_polygons(p) for p in polygons]

    def to(self, *args, **kwargs) -> "PolygonMasks":
        return self

    def get_bounding_boxes(self):
        from .boxes import Boxes

        boxes = np.zeros((len(self.polygons), 4), dtype=np.float32)
        for idx, polygons_per_instance in enumerate(self.polygons):
            minxy = np.array([float("inf"), float("inf")])
            maxxy = np.zeros(2)
            for polygon in polygons_per_instance:
                coords = polygon.reshape(-1, 2)
                minxy = np.minimum(minxy, coords.min(axis=0))
                maxxy = np.maximum(maxxy, coords.max(axis=0))
            boxes[idx, :2] = minxy
            boxes[idx, 2:] = maxxy
        return Boxes(boxes)

    def nonempty(self) -> np.ndarray:
        return np.array([1 if len(p) > 0 else 0 for p in self.polygons], dtype=bool)

    def __getitem__(self, item) -> "PolygonMasks":
        if isinstance(item, int):
            selected = [self.polygons[item]]
        elif isinstance(item, slice):
            selected = self.polygons[item]
        elif isinstance(item, list):
            selected = [self.polygons[i] for i in item]
        else:
            item = np.asarray(item)
            if item.dtype == bool:
                item = np.nonzero(item)[0]
            selected = [self.polygons[int(i)] for i in item]
        return PolygonMasks(selected)

    def __iter__(self) -> Iterator[List[np.ndarray]]:
        return iter(self.polygons)

    def __repr__(self) -> str:
        return "PolygonMasks(num_instances={})".format(len(self.polygons))

    def __len__(self) -> int:
        return len(self.polygons)

    def crop_and_resize(self, boxes, mask_size: int) -> jnp.ndarray:
        """Rasterize each instance's polygons inside its box at mask_size."""
        boxes = np.asarray(boxes.tensor if hasattr(boxes, "tensor") else boxes)
        assert boxes.shape[0] == len(self), "{} != {}".format(boxes.shape[0], len(self))
        results = [
            rasterize_polygons_within_box(poly, box, mask_size)
            for poly, box in zip(self.polygons, boxes)
        ]
        if len(results) == 0:
            return jnp.zeros((0, mask_size, mask_size), dtype=jnp.bool_)
        return jnp.asarray(np.stack(results))

    def area(self) -> np.ndarray:
        return np.array(
            [
                sum(polygon_area(p[0::2], p[1::2]) for p in polygons_per_instance)
                for polygons_per_instance in self.polygons
            ]
        )

    @staticmethod
    def cat(polymasks_list: List["PolygonMasks"]) -> "PolygonMasks":
        return PolygonMasks(list(itertools.chain(*[pm.polygons for pm in polymasks_list])))
