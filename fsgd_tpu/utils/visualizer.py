"""Drawing utilities for detection outputs.

Role of detectron2/utils/visualizer.py (1127 LoC): ``Visualizer`` draws
boxes, labels, masks, keypoints, semantic and panoptic segmentations on an
image via matplotlib; ``VisImage`` wraps the canvas.  Covers the API the
tools/demo/gambler-visualization paths use.
"""

from __future__ import annotations

from typing import List, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.colors as mplc
import matplotlib.figure as mplfigure
import numpy as np
from matplotlib.backends.backend_agg import FigureCanvasAgg

from .colormap import colormap, random_color

__all__ = ["Visualizer", "VisImage", "ColorMode", "GenericMask"]

_SMALL_OBJECT_AREA_THRESH = 1000
_KEYPOINT_THRESHOLD = 0.05
_RED = (1.0, 0.2, 0.2)


class ColorMode:
    IMAGE = 0
    SEGMENTATION = 1
    IMAGE_BW = 2


class GenericMask:
    """Normalize mask representations (bitmask / polygons / RLE) for drawing."""

    def __init__(self, mask_or_polygons, height: int, width: int):
        self._mask = self._polygons = None
        self.height, self.width = height, width
        m = mask_or_polygons
        if isinstance(m, dict):  # RLE
            from ..data import rle as rle_codec

            self._mask = rle_codec.decode(m).astype(np.uint8)
        elif isinstance(m, list):  # polygons
            self._polygons = [np.asarray(p).reshape(-1) for p in m]
        elif isinstance(m, np.ndarray):
            self._mask = m.astype(np.uint8)
        else:
            raise ValueError("Unsupported mask type {}".format(type(m)))

    @property
    def mask(self):
        if self._mask is None:
            from ..structures.masks import polygons_to_bitmask

            self._mask = polygons_to_bitmask(self._polygons, self.height, self.width).astype(np.uint8)
        return self._mask

    @property
    def polygons(self):
        if self._polygons is None:
            import cv2

            contours, _ = cv2.findContours(
                self._mask.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
            )
            self._polygons = [c.reshape(-1).astype(np.float64) for c in contours if len(c) >= 3]
        return self._polygons

    def area(self):
        return float(self.mask.sum())

    def bbox(self):
        ys, xs = np.nonzero(self.mask)
        if len(xs) == 0:
            return np.zeros(4)
        return np.array([xs.min(), ys.min(), xs.max(), ys.max()], dtype=np.float64)

    def has_holes(self) -> bool:
        """Whether the mask has interior contours (reference visualizer.py:100-122)."""
        import cv2

        hierarchy = cv2.findContours(
            self.mask.astype(np.uint8), cv2.RETR_CCOMP, cv2.CHAIN_APPROX_NONE
        )[-1]
        if hierarchy is None:
            return False
        return (hierarchy.reshape(-1, 4)[:, 3] >= 0).sum() > 0


class VisImage:
    def __init__(self, img: np.ndarray, scale: float = 1.0):
        self.img = img
        self.scale = scale
        self.width, self.height = img.shape[1], img.shape[0]
        fig = mplfigure.Figure(frameon=False)
        self.dpi = fig.get_dpi()
        fig.set_size_inches(
            (self.width * scale + 1e-2) / self.dpi, (self.height * scale + 1e-2) / self.dpi
        )
        self.canvas = FigureCanvasAgg(fig)
        ax = fig.add_axes([0.0, 0.0, 1.0, 1.0])
        ax.axis("off")
        ax.imshow(img, extent=(0, self.width, self.height, 0), interpolation="nearest")
        self.fig = fig
        self.ax = ax

    def save(self, filepath: str):
        self.fig.savefig(filepath)

    def get_image(self) -> np.ndarray:
        canvas = self.canvas
        s, (width, height) = canvas.print_to_buffer()
        buffer = np.frombuffer(s, dtype="uint8")
        img_rgba = buffer.reshape(height, width, 4)
        return img_rgba[:, :, :3]


class Visualizer:
    def __init__(self, img_rgb: np.ndarray, metadata=None, scale: float = 1.0, instance_mode=ColorMode.IMAGE):
        self.img = np.asarray(img_rgb).clip(0, 255).astype(np.uint8)
        self.metadata = metadata
        self.output = VisImage(self.img, scale=scale)
        self._instance_mode = instance_mode
        self._default_font_size = max(np.sqrt(self.img.shape[0] * self.img.shape[1]) // 90, 10 // scale)

    # -- high level ----------------------------------------------------------
    def draw_instance_predictions(self, predictions) -> VisImage:
        """Reference visualizer.py:324-372, including the SEGMENTATION
        (per-class thing_colors) and IMAGE_BW (grayscale outside masks)
        color modes."""
        boxes = np.asarray(predictions.pred_boxes.tensor) if predictions.has("pred_boxes") else None
        scores = np.asarray(predictions.scores) if predictions.has("scores") else None
        classes = np.asarray(predictions.pred_classes) if predictions.has("pred_classes") else None
        labels = self._create_labels(classes, scores)
        masks = np.asarray(predictions.pred_masks) if predictions.has("pred_masks") else None
        keypoints = np.asarray(predictions.pred_keypoints) if predictions.has("pred_keypoints") else None

        colors = None
        alpha = 0.5
        thing_colors = self.metadata.get("thing_colors", None) if self.metadata is not None else None
        if self._instance_mode == ColorMode.SEGMENTATION and thing_colors and classes is not None:
            colors = [
                self._jitter(np.asarray(thing_colors[int(c)], np.float64) / 255.0) for c in classes
            ]
            alpha = 0.8
        if self._instance_mode == ColorMode.IMAGE_BW:
            bw_mask = None
            if masks is not None:
                bw_mask = np.any(
                    [GenericMask(m, *self.img.shape[:2]).mask.astype(bool) for m in masks], axis=0
                )
            self.output = VisImage(self._create_grayscale_image(bw_mask), scale=self.output.scale)
            alpha = 0.3
        return self.overlay_instances(
            boxes=boxes, labels=labels, masks=masks, keypoints=keypoints,
            assigned_colors=colors, alpha=alpha,
        )

    def draw_dataset_dict(self, dic) -> VisImage:
        annos = dic.get("annotations", None)
        if annos:
            from ..structures import BoxMode

            boxes = np.array(
                [BoxMode.convert(x["bbox"], x["bbox_mode"], BoxMode.XYXY_ABS) for x in annos]
            )
            labels = self._create_labels(np.array([x["category_id"] for x in annos]), None)
            masks = [x["segmentation"] for x in annos if "segmentation" in x] or None
            self.overlay_instances(boxes=boxes, labels=labels, masks=masks)
        return self.output

    def overlay_instances(self, *, boxes=None, labels=None, masks=None, keypoints=None,
                          assigned_colors=None, alpha=0.5) -> VisImage:
        num_instances = 0
        for x in (boxes, labels, masks, keypoints):
            if x is not None:
                num_instances = max(num_instances, len(x))
        if num_instances == 0:
            return self.output
        if boxes is not None and np.asarray(boxes).ndim == 2 and np.asarray(boxes).shape[1] == 5:
            return self.overlay_rotated_instances(
                boxes=boxes, labels=labels, assigned_colors=assigned_colors
            )
        cmap = colormap(rgb=True, maximum=1.0)
        if assigned_colors is None:
            assigned_colors = [cmap[i % len(cmap)] for i in range(num_instances)]

        for i in range(num_instances):
            color = assigned_colors[i]
            if boxes is not None and i < len(boxes):
                self.draw_box(boxes[i], edge_color=color)
            if masks is not None and i < len(masks):
                gm = GenericMask(masks[i], self.img.shape[0], self.img.shape[1])
                self.draw_binary_mask(gm.mask, color=color, alpha=alpha)
            if keypoints is not None and i < len(keypoints):
                self.draw_and_connect_keypoints(keypoints[i])
            if labels is not None and i < len(labels) and boxes is not None and i < len(boxes):
                x0, y0 = boxes[i][0], boxes[i][1]
                # contrast the label against its instance color (reference :627-641)
                lighter = self._change_color_brightness(color, brightness_factor=0.7)
                self.draw_text(labels[i], (x0, y0), color=lighter)
        return self.output

    def overlay_rotated_instances(self, boxes=None, labels=None, assigned_colors=None) -> VisImage:
        """(cx, cy, w, h, angle) boxes (reference visualizer.py:648-686)."""
        num_instances = len(boxes) if boxes is not None else 0
        if num_instances == 0:
            return self.output
        cmap = colormap(rgb=True, maximum=1.0)
        if assigned_colors is None:
            assigned_colors = [cmap[i % len(cmap)] for i in range(num_instances)]
        # draw large boxes first so small ones stay visible
        areas = np.asarray(boxes)[:, 2] * np.asarray(boxes)[:, 3]
        order = np.argsort(-areas).tolist()
        for i in order:
            self.draw_rotated_box_with_label(
                boxes[i],
                edge_color=assigned_colors[i],
                label=labels[i] if labels is not None and i < len(labels) else None,
            )
        return self.output

    def draw_rotated_box_with_label(self, rotated_box, alpha=0.5, edge_color="g",
                                    line_style="-", label=None) -> VisImage:
        """Reference visualizer.py:830-881."""
        cx, cy, w, h, angle = [float(v) for v in rotated_box[:5]]
        theta = angle * np.pi / 180.0
        c, s = np.cos(theta), np.sin(theta)
        rect = [(-w / 2, h / 2), (-w / 2, -h / 2), (w / 2, -h / 2), (w / 2, h / 2)]
        rotated = [(c * xx + s * yy + cx, -s * xx + c * yy + cy) for xx, yy in rect]
        linewidth = max(self._default_font_size / 4, 1) * (2 if w * h < _SMALL_OBJECT_AREA_THRESH else 1)
        for k in range(4):
            j = (k + 1) % 4
            self.draw_line(
                [rotated[k][0], rotated[j][0]], [rotated[k][1], rotated[j][1]],
                color=edge_color,
                linestyle="--" if k == 1 else line_style,
                linewidth=linewidth,
            )
        if label is not None:
            lighter = self._change_color_brightness(edge_color, brightness_factor=0.7)
            self.draw_text(label, rotated[1], color=lighter, rotation=angle)
        return self.output

    def draw_and_connect_keypoints(self, keypoints) -> VisImage:
        """Draw visible keypoints, connect them by the metadata's
        keypoint_connection_rules, and draw the nose->mid-shoulder->mid-hip
        trunk (reference visualizer.py:687-748)."""
        visible = {}
        names = self.metadata.get("keypoint_names", None) if self.metadata is not None else None
        keypoints = np.asarray(keypoints)
        for idx, kp in enumerate(keypoints):
            x, y = kp[0], kp[1]
            prob = kp[2] if len(kp) > 2 else 1.0
            if prob > _KEYPOINT_THRESHOLD:
                self.draw_circle((x, y), color=_RED)
                if names:
                    visible[names[idx]] = (x, y)
        rules = self.metadata.get("keypoint_connection_rules", None) if self.metadata is not None else None
        if rules:
            for kp0, kp1, color in rules:
                if kp0 in visible and kp1 in visible:
                    x0, y0 = visible[kp0]
                    x1, y1 = visible[kp1]
                    self.draw_line([x0, x1], [y0, y1], color=np.asarray(color, np.float64) / 255.0)
        # trunk: nose -> mid-shoulder -> mid-hip
        try:
            ls_x, ls_y = visible["left_shoulder"]
            rs_x, rs_y = visible["right_shoulder"]
            mid_shoulder = ((ls_x + rs_x) / 2, (ls_y + rs_y) / 2)
        except KeyError:
            pass
        else:
            if "nose" in visible:
                nose_x, nose_y = visible["nose"]
                self.draw_line([nose_x, mid_shoulder[0]], [nose_y, mid_shoulder[1]], color=_RED)
            try:
                lh_x, lh_y = visible["left_hip"]
                rh_x, rh_y = visible["right_hip"]
            except KeyError:
                pass
            else:
                mid_hip = ((lh_x + rh_x) / 2, (lh_y + rh_y) / 2)
                self.draw_line(
                    [mid_hip[0], mid_shoulder[0]], [mid_hip[1], mid_shoulder[1]], color=_RED
                )
        return self.output

    def draw_sem_seg(self, sem_seg, area_threshold=None, alpha=0.5) -> VisImage:
        sem_seg = np.asarray(sem_seg)
        labels, areas = np.unique(sem_seg, return_counts=True)
        cmap = colormap(rgb=True, maximum=1.0)
        for label in labels[np.argsort(-areas)]:
            if label == 255:
                continue
            mask = (sem_seg == label).astype(np.uint8)
            if area_threshold and mask.sum() < area_threshold:
                continue
            self.draw_binary_mask(mask, color=cmap[int(label) % len(cmap)], alpha=alpha)
        return self.output

    def draw_panoptic_seg(self, panoptic_seg, segments_info, alpha=0.5) -> VisImage:
        cmap = colormap(rgb=True, maximum=1.0)
        panoptic_seg = np.asarray(panoptic_seg)
        for seg in segments_info:
            mask = (panoptic_seg == seg["id"]).astype(np.uint8)
            self.draw_binary_mask(mask, color=cmap[seg["category_id"] % len(cmap)], alpha=alpha)
        return self.output

    # -- primitives ----------------------------------------------------------
    def draw_box(self, box, alpha=0.5, edge_color="g", line_style="-") -> VisImage:
        x0, y0, x1, y1 = box[:4]
        width = x1 - x0
        height = y1 - y0
        linewidth = max(self._default_font_size / 4, 1)
        self.output.ax.add_patch(
            matplotlib.patches.Rectangle(
                (x0, y0), width, height, fill=False,
                edgecolor=mplc.to_rgb(edge_color) + (alpha,) if isinstance(edge_color, str) else tuple(edge_color) + (alpha,),
                linewidth=linewidth * self.output.scale, linestyle=line_style,
            )
        )
        return self.output

    def draw_text(self, text, position, *, font_size=None, color="g", rotation=0) -> VisImage:
        if font_size is None:
            font_size = self._default_font_size
        x, y = position
        self.output.ax.text(
            x, y, text, size=font_size * self.output.scale, family="sans-serif",
            bbox={"facecolor": "black", "alpha": 0.8, "pad": 0.7, "edgecolor": "none"},
            verticalalignment="top", horizontalalignment="left",
            color=np.clip(np.maximum(list(mplc.to_rgb(color) if isinstance(color, str) else color), 0.2), 0, 1),
            zorder=10, rotation=rotation,
        )
        return self.output

    def draw_binary_mask(self, binary_mask, color=None, *, edge_color=None, alpha=0.5) -> VisImage:
        if color is None:
            color = random_color(rgb=True, maximum=1.0)
        binary_mask = binary_mask.astype(bool)
        shape2d = binary_mask.shape
        rgba = np.zeros(shape2d + (4,), dtype=np.float32)
        rgba[:, :, :3] = color
        rgba[:, :, 3] = binary_mask * alpha
        self.output.ax.imshow(rgba, extent=(0, self.output.width, self.output.height, 0))
        return self.output

    def draw_polygon(self, segment, color, edge_color=None, alpha=0.5) -> VisImage:
        polygon = matplotlib.patches.Polygon(
            np.asarray(segment).reshape(-1, 2), fill=True,
            facecolor=tuple(color) + (alpha,),
            edgecolor=edge_color or tuple(np.minimum(np.array(color) * 0.7, 1.0)),
            linewidth=max(self._default_font_size // 15 * self.output.scale, 1),
        )
        self.output.ax.add_patch(polygon)
        return self.output

    def draw_keypoints(self, keypoints, color="r") -> VisImage:
        for kp in np.asarray(keypoints):
            x, y = kp[0], kp[1]
            vis = kp[2] if len(kp) > 2 else 1
            if vis > 0:
                self.output.ax.add_patch(
                    matplotlib.patches.Circle((x, y), radius=max(self._default_font_size // 4, 2), color=color)
                )
        return self.output

    def draw_circle(self, circle_coord, color, radius=3) -> VisImage:
        self.output.ax.add_patch(
            matplotlib.patches.Circle(circle_coord, radius=radius, fill=True, color=color)
        )
        return self.output

    def draw_line(self, x_data, y_data, color, linestyle="-", linewidth=None) -> VisImage:
        self.output.ax.add_line(
            matplotlib.lines.Line2D(
                x_data, y_data, linewidth=(linewidth or max(self._default_font_size / 3, 1)) * self.output.scale,
                color=color, linestyle=linestyle,
            )
        )
        return self.output

    # -- helpers -------------------------------------------------------------
    def _jitter(self, color):
        """Randomly shift a color to tell same-class instances apart
        (reference visualizer.py:1028-1045)."""
        color = mplc.to_rgb(color)
        vec = np.random.rand(3) * 0.5
        vec = vec / np.linalg.norm(vec)
        return tuple(np.clip(vec + color, 0, 1))

    def _create_grayscale_image(self, mask=None) -> np.ndarray:
        """Grayscale copy, optionally keeping color inside ``mask``
        (reference visualizer.py:1047-1056)."""
        img_bw = self.img.astype("f4").mean(axis=2)
        img_bw = np.stack([img_bw] * 3, axis=2)
        if mask is not None:
            img_bw[mask] = self.img[mask]
        return img_bw.astype("uint8")

    def _change_color_brightness(self, color, brightness_factor: float):
        """Lighten (>0) or darken (<0) a color in HLS space
        (reference visualizer.py:1058-1081)."""
        assert -1.0 <= brightness_factor <= 1.0
        import colorsys

        color = mplc.to_rgb(color)
        h, l, s = colorsys.rgb_to_hls(*color)
        l = l + brightness_factor * l
        l = min(max(l, 0.0), 1.0)
        return colorsys.hls_to_rgb(h, l, s)

    def _create_labels(self, classes, scores) -> Optional[List[str]]:
        if classes is None:
            return None
        names = None
        if self.metadata is not None:
            names = self.metadata.get("thing_classes", None)
        labels = [names[int(c)] if names and int(c) < len(names) else str(int(c)) for c in classes]
        if scores is not None:
            labels = ["{} {:.0f}%".format(l, s * 100) for l, s in zip(labels, scores)]
        return labels

    def get_output(self) -> VisImage:
        return self.output
