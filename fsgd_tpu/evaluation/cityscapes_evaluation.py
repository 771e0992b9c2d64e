"""Cityscapes instance-segmentation evaluator.

Role of detectron2/evaluation/cityscapes_evaluation.py (318 LoC), which shells
out to the cityscapesscripts package.  That package is not a dependency here;
instead GT polygons are converted to COCO-format on the fly and the AP is
computed with our COCO machinery (AP@[.5:.95] over the 8 thing classes) —
numerically equivalent protocol, minus cityscapesscripts' txt report.
"""

from __future__ import annotations

import itertools
import logging
from collections import OrderedDict

import numpy as np

from ..data.catalog import DatasetCatalog, MetadataCatalog
from ..data.cocoapi import COCO
from ..utils import comm
from .cocoeval import COCOeval
from .coco_evaluation import instances_to_coco_json
from .evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)

__all__ = ["CityscapesEvaluator"]


class CityscapesEvaluator(DatasetEvaluator):
    def __init__(self, dataset_name, output_dir=None):
        self._dataset_name = dataset_name
        self._metadata = MetadataCatalog.get(dataset_name)
        self._output_dir = output_dir
        self._predictions = []
        self._coco_gt = None

    def reset(self):
        self._predictions = []

    def _build_gt(self):
        from ..structures import BoxMode

        dicts = DatasetCatalog.get(self._dataset_name)
        images, annotations = [], []
        ann_id = 1
        for i, d in enumerate(dicts):
            images.append(
                {"id": d["image_id"], "height": d["height"], "width": d["width"], "file_name": d["file_name"]}
            )
            for a in d.get("annotations", []):
                bbox = BoxMode.convert(a["bbox"], a["bbox_mode"], BoxMode.XYWH_ABS)
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": d["image_id"],
                        "category_id": a["category_id"],
                        "bbox": list(map(float, bbox)),
                        "area": float(bbox[2] * bbox[3]),
                        "iscrowd": a.get("iscrowd", 0),
                        "segmentation": a.get("segmentation"),
                    }
                )
                ann_id += 1
        categories = [{"id": i, "name": n} for i, n in enumerate(self._metadata.thing_classes)]
        gt = COCO()
        gt.dataset = {"images": images, "annotations": annotations, "categories": categories}
        gt.createIndex()
        return gt

    def process(self, inputs, outputs):
        for input, output in zip(inputs, outputs):
            if "instances" in output:
                self._predictions.extend(
                    instances_to_coco_json(output["instances"], input["image_id"])
                )

    def evaluate(self):
        comm.synchronize()
        predictions = list(itertools.chain(*comm.gather(self._predictions, dst=0)))
        if not comm.is_main_process():
            return {}
        if not predictions:
            return {}
        gt = self._build_gt()
        results = OrderedDict()
        for task in ("bbox", "segm"):
            task_preds = predictions
            if task == "segm":
                task_preds = [p for p in predictions if "segmentation" in p]
                if not task_preds:
                    continue
            dt = gt.loadRes(task_preds)
            ev = COCOeval(gt, dt, task)
            ev.evaluate()
            ev.accumulate()
            ev.summarize()
            results[task] = {"AP": float(ev.stats[0] * 100), "AP50": float(ev.stats[1] * 100)}
        logger.info("Cityscapes evaluation: %s", results)
        return results
