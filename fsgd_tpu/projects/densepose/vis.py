"""DensePose result visualizers (cv2-based, host-side).

Parity target: projects/DensePose/densepose/vis/{base,densepose,bounding_box,
extractor}.py — ``MatrixVisualizer`` (masked colormap overlay inside a box),
the DensePoseResults visualizers (fine segmentation / U / V / contours),
scored bounding boxes, compound composition, and the Instances->data
extractors ``apply_net show`` drives.

The reference's matplotlib contour path (vis/densepose.py:72-140) is
replaced by a cv2 iso-level implementation equivalent to its
``DensePoseResultsCustomContourVisualizer`` (vis/densepose.py:143-220).
"""

from __future__ import annotations

import logging
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from fsgd_tpu.structures import BoxMode

from .structures import DensePoseResult

logger = logging.getLogger(__name__)

__all__ = [
    "MatrixVisualizer",
    "DensePoseResultsVisualizer",
    "DensePoseResultsFineSegmentationVisualizer",
    "DensePoseResultsUVisualizer",
    "DensePoseResultsVVisualizer",
    "DensePoseResultsContourVisualizer",
    "ScoredBoundingBoxVisualizer",
    "CompoundVisualizer",
    "create_extractor",
    "CompoundExtractor",
    "DensePoseResultExtractor",
]


class MatrixVisualizer:
    """Overlay a colormapped matrix into image[bbox], masked
    (reference vis/base.py:12-61)."""

    def __init__(self, inplace=True, cmap=None, val_scale=1.0, alpha=0.7):
        import cv2

        self.inplace = inplace
        self.cmap = cmap if cmap is not None else cv2.COLORMAP_PARULA
        self.val_scale = val_scale
        self.alpha = alpha

    def visualize(self, image_bgr, mask, matrix, bbox_xywh):
        import cv2

        image_target = image_bgr if self.inplace else image_bgr.copy()
        x, y, w, h = [int(v) for v in bbox_xywh]
        if w <= 0 or h <= 0:
            return image_target
        x1, y1 = max(x, 0), max(y, 0)
        x2 = min(x + w, image_target.shape[1])
        y2 = min(y + h, image_target.shape[0])
        if x2 <= x1 or y2 <= y1:
            return image_target
        mask = mask[y1 - y : y2 - y, x1 - x : x2 - x]
        matrix = matrix[y1 - y : y2 - y, x1 - x : x2 - x]
        matrix_scaled = np.clip(matrix.astype(np.float32) * self.val_scale, 0, 255).astype(np.uint8)
        matrix_vis = cv2.applyColorMap(matrix_scaled, self.cmap)
        region = image_target[y1:y2, x1:x2]
        blended = (matrix_vis * self.alpha + region * (1.0 - self.alpha)).astype(np.uint8)
        region[mask > 0] = blended[mask > 0]
        return image_target


def _extract_i(iuv_arr):
    return iuv_arr[0]


def _extract_u(iuv_arr):
    return iuv_arr[1]


def _extract_v(iuv_arr):
    return iuv_arr[2]


class DensePoseResultsVisualizer:
    """Iterate a DensePoseResult's encoded entries (reference vis/densepose.py:11-22)."""

    def visualize(self, image_bgr, densepose_result: Optional[DensePoseResult]):
        if densepose_result is None:
            return image_bgr
        for i, (shape_and_data, bbox_xywh) in enumerate(
            zip(densepose_result.results, densepose_result.boxes_xywh)
        ):
            iuv_arr = DensePoseResult.decode_png_data(*shape_and_data)
            image_bgr = self.visualize_iuv_arr(image_bgr, iuv_arr, bbox_xywh)
        return image_bgr

    def visualize_iuv_arr(self, image_bgr, iuv_arr, bbox_xywh):
        raise NotImplementedError


class _MaskedColormapResultsVisualizer(DensePoseResultsVisualizer):
    def __init__(self, data_extractor: Callable, val_scale=1.0, alpha=0.7, inplace=True):
        self.data_extractor = data_extractor
        self.mask_visualizer = MatrixVisualizer(inplace=inplace, val_scale=val_scale, alpha=alpha)

    def visualize_iuv_arr(self, image_bgr, iuv_arr, bbox_xywh):
        matrix = self.data_extractor(iuv_arr)
        segm = _extract_i(iuv_arr)
        mask = (segm > 0).astype(np.uint8)
        return self.mask_visualizer.visualize(image_bgr, mask, matrix, bbox_xywh)


class DensePoseResultsFineSegmentationVisualizer(_MaskedColormapResultsVisualizer):
    """24-patch segmentation overlay (reference vis/densepose.py:223-231)."""

    def __init__(self, inplace=True, alpha=0.7):
        super().__init__(_extract_i, val_scale=255.0 / 25.0, alpha=alpha, inplace=inplace)


class DensePoseResultsUVisualizer(_MaskedColormapResultsVisualizer):
    def __init__(self, inplace=True, alpha=0.7):
        super().__init__(_extract_u, val_scale=1.0, alpha=alpha, inplace=inplace)


class DensePoseResultsVVisualizer(_MaskedColormapResultsVisualizer):
    def __init__(self, inplace=True, alpha=0.7):
        super().__init__(_extract_v, val_scale=1.0, alpha=alpha, inplace=inplace)


class DensePoseResultsContourVisualizer(DensePoseResultsVisualizer):
    """U/V iso-level contours via cv2 (reference
    DensePoseResultsCustomContourVisualizer, vis/densepose.py:143-220)."""

    def __init__(self, levels=10, inplace=True):
        self.levels = np.linspace(0, 1, levels, endpoint=False)[1:]
        self.inplace = inplace

    def visualize_iuv_arr(self, image_bgr, iuv_arr, bbox_xywh):
        import cv2

        if not self.inplace:
            image_bgr = image_bgr.copy()
        x, y, w, h = [int(v) for v in bbox_xywh]
        segm = _extract_i(iuv_arr)
        for chan, color in ((_extract_u(iuv_arr), (220, 160, 30)), (_extract_v(iuv_arr), (30, 160, 220))):
            vals = chan.astype(np.float32) / 255.0
            for level in self.levels:
                binary = ((vals >= level) & (segm > 0)).astype(np.uint8)
                contours, _ = cv2.findContours(binary, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)
                shifted = [c + np.array([[[x, y]]], dtype=c.dtype) for c in contours]
                cv2.drawContours(image_bgr, shifted, -1, color, 1)
        return image_bgr


class ScoredBoundingBoxVisualizer:
    """Boxes + scores (reference vis/bounding_box.py:8-36)."""

    def __init__(self, inplace=True):
        self.inplace = inplace

    def visualize(self, image_bgr, data):
        import cv2

        if data is None:
            return image_bgr
        boxes_xywh, scores = data
        if not self.inplace:
            image_bgr = image_bgr.copy()
        for bbox, score in zip(boxes_xywh, scores):
            x, y, w, h = [int(v) for v in bbox]
            cv2.rectangle(image_bgr, (x, y), (x + w, y + h), (0, 255, 0), 1)
            cv2.putText(
                image_bgr, "{:.3f}".format(float(score)), (x, max(y - 2, 0)),
                cv2.FONT_HERSHEY_SIMPLEX, 0.4, (0, 255, 0), 1,
            )
        return image_bgr


class CompoundVisualizer:
    """Apply visualizers over parallel data entries (reference vis/base.py:166-190)."""

    def __init__(self, visualizers: Sequence):
        self.visualizers = list(visualizers)

    def visualize(self, image_bgr, data: Sequence):
        assert len(data) == len(self.visualizers)
        for vis, d in zip(self.visualizers, data):
            image_bgr = vis.visualize(image_bgr, d)
        return image_bgr


# -- ground-truth data visualizers (reference vis/densepose.py:486-590) ------


class DensePoseDataCoarseSegmentationVisualizer:
    """GT coarse segmentation over its box (reference vis/densepose.py:486-511).

    data: (boxes_xywh, [DensePoseDataRelative]) pairs."""

    def __init__(self, inplace=True, alpha=0.7):
        from .structures import DensePoseDataRelative

        self.mask_visualizer = MatrixVisualizer(
            inplace=inplace, val_scale=255.0 / DensePoseDataRelative.N_BODY_PARTS, alpha=alpha
        )

    def visualize(self, image_bgr, bbox_densepose_datas):
        import cv2

        if bbox_densepose_datas is None:
            return image_bgr
        for bbox_xywh, dp in zip(*bbox_densepose_datas):
            if dp is None:
                continue
            x, y, w, h = [int(v) for v in bbox_xywh]
            matrix = cv2.resize(
                dp.segm.astype(np.float32), (max(w, 1), max(h, 1)),
                interpolation=cv2.INTER_NEAREST,
            )
            self.mask_visualizer.visualize(image_bgr, (matrix > 0).astype(np.uint8), matrix, bbox_xywh)
        return image_bgr


class DensePoseDataPointsVisualizer:
    """GT annotated points, optionally colored by a per-point value
    (reference vis/densepose.py:514-590)."""

    def __init__(self, densepose_data_to_value_fn=None):
        self.to_value = densepose_data_to_value_fn

    def visualize(self, image_bgr, bbox_densepose_datas):
        import cv2

        if bbox_densepose_datas is None:
            return image_bgr
        for bbox_xywh, dp in zip(*bbox_densepose_datas):
            if dp is None:
                continue
            x0, y0, w, h = bbox_xywh
            xs = dp.x * w / 256.0 + x0
            ys = dp.y * h / 256.0 + y0
            if self.to_value is None:
                colors = [(0, 255, 0)] * len(xs)
            else:
                vals = (np.clip(self.to_value(dp), 0, 1) * 255).astype(np.uint8)
                cmapped = cv2.applyColorMap(vals.reshape(-1, 1), cv2.COLORMAP_PARULA)
                colors = [tuple(int(c) for c in cmapped[k, 0]) for k in range(len(vals))]
            for px, py, color in zip(xs, ys, colors):
                cv2.circle(image_bgr, (int(px), int(py)), 2, color, -1)
        return image_bgr


class DensePoseDataPointsUVisualizer(DensePoseDataPointsVisualizer):
    def __init__(self):
        super().__init__(lambda dp: dp.u)


class DensePoseDataPointsVVisualizer(DensePoseDataPointsVisualizer):
    def __init__(self):
        super().__init__(lambda dp: dp.v)


class DensePoseDataPointsIVisualizer(DensePoseDataPointsVisualizer):
    def __init__(self):
        from .structures import DensePoseDataRelative

        super().__init__(lambda dp: dp.i / DensePoseDataRelative.N_PART_LABELS)


class BoundingBoxVisualizer:
    """Plain boxes (reference vis/bounding_box.py:8-20)."""

    def visualize(self, image_bgr, boxes_xywh):
        import cv2

        if boxes_xywh is None:
            return image_bgr
        for bbox in boxes_xywh:
            x, y, w, h = [int(v) for v in bbox]
            cv2.rectangle(image_bgr, (x, y), (x + w, y + h), (0, 255, 0), 1)
        return image_bgr


# -- extractors (reference vis/extractor.py:24-152) --------------------------


class DensePoseResultExtractor:
    def __call__(self, instances) -> Optional[DensePoseResult]:
        if not instances.has("pred_densepose") or len(instances) == 0:
            return None
        boxes_xyxy = np.asarray(instances.pred_boxes.tensor)
        boxes_xywh = BoxMode.convert(boxes_xyxy, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
        return DensePoseResult.from_dets(instances.pred_densepose, boxes_xywh)


class ScoredBoundingBoxExtractor:
    def __call__(self, instances):
        if len(instances) == 0 or not instances.has("pred_boxes"):
            return None
        boxes_xyxy = np.asarray(instances.pred_boxes.tensor)
        boxes_xywh = BoxMode.convert(boxes_xyxy, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
        return boxes_xywh, np.asarray(instances.scores)


class CompoundExtractor:
    def __init__(self, extractors: Sequence):
        self.extractors = list(extractors)

    def __call__(self, instances) -> List:
        return [e(instances) for e in self.extractors]


def create_extractor(visualizer):
    if isinstance(visualizer, ScoredBoundingBoxVisualizer):
        return ScoredBoundingBoxExtractor()
    if isinstance(visualizer, DensePoseResultsVisualizer):
        return DensePoseResultExtractor()
    if isinstance(visualizer, CompoundVisualizer):
        return CompoundExtractor([create_extractor(v) for v in visualizer.visualizers])
    raise ValueError("no extractor for {}".format(type(visualizer)))
