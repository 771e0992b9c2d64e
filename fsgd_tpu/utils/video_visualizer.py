"""Video visualization with temporally-consistent instance colors.

Role of detectron2/utils/video_visualizer.py (235 LoC): track detections
across frames by IoU + class matching and keep their colors stable.
"""

from __future__ import annotations

import numpy as np

from ..structures import Boxes, pairwise_iou
from .colormap import random_color
from .visualizer import ColorMode, Visualizer

__all__ = ["VideoVisualizer"]


class _DetectedInstance:
    __slots__ = ["label", "bbox", "color", "ttl"]

    def __init__(self, label, bbox, color, ttl):
        self.label = label
        self.bbox = bbox
        self.color = color
        self.ttl = ttl


class VideoVisualizer:
    def __init__(self, metadata=None, instance_mode=ColorMode.IMAGE):
        self.metadata = metadata
        self._old_instances = []
        self._instance_mode = instance_mode

    def draw_instance_predictions(self, frame, predictions):
        frame_visualizer = Visualizer(frame, self.metadata)
        num_instances = len(predictions)
        if num_instances == 0:
            return frame_visualizer.output

        boxes = np.asarray(predictions.pred_boxes.tensor)
        classes = np.asarray(predictions.pred_classes)
        scores = np.asarray(predictions.scores) if predictions.has("scores") else None
        detected = [
            _DetectedInstance(int(classes[i]), boxes[i], color=None, ttl=8)
            for i in range(num_instances)
        ]
        colors = self._assign_colors(detected)
        labels = frame_visualizer._create_labels(classes, scores)
        masks = np.asarray(predictions.pred_masks) if predictions.has("pred_masks") else None
        frame_visualizer.overlay_instances(
            boxes=boxes, labels=labels, masks=masks, assigned_colors=colors
        )
        return frame_visualizer.output

    def _assign_colors(self, instances):
        """Greedy IoU matching against the previous frame's instances."""
        if self._old_instances:
            old_boxes = Boxes(np.stack([x.bbox for x in self._old_instances]))
            new_boxes = Boxes(np.stack([x.bbox for x in instances]))
            ious = np.asarray(pairwise_iou(old_boxes, new_boxes))
            threshold = 0.6
            for old_idx, old in enumerate(self._old_instances):
                for new_idx, new in enumerate(instances):
                    if ious[old_idx, new_idx] > threshold and old.label == new.label and new.color is None:
                        new.color = old.color
                        ious[old_idx, :] = 0
                        break
        for inst in instances:
            if inst.color is None:
                inst.color = random_color(rgb=True, maximum=1.0)
        # age out old instances
        kept = []
        for old in self._old_instances:
            old.ttl -= 1
            if old.ttl > 0:
                kept.append(old)
        self._old_instances = instances + kept
        return [inst.color for inst in instances]
