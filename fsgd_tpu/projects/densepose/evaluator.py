"""DensePose COCO evaluator (GPS-AP).

Parity target: projects/DensePose/densepose/evaluator.py:24-133
(``DensePoseCOCOEvaluator``): per-image predictions become COCO-json rows
with PNG-encoded per-box IUV payloads, gathered across ranks, then scored
by ``DensePoseCocoEval``.
"""

from __future__ import annotations

import copy
import itertools
import json
import logging
import os
from collections import OrderedDict

import numpy as np

from fsgd_tpu.data.catalog import MetadataCatalog
from fsgd_tpu.evaluation.evaluator import DatasetEvaluator
from fsgd_tpu.structures import BoxMode
from fsgd_tpu.utils import comm

from .densepose_cocoeval import DensePoseCocoEval
from .structures import DensePoseResult

logger = logging.getLogger(__name__)

__all__ = ["DensePoseCOCOEvaluator", "prediction_to_json"]


class DensePoseCOCOEvaluator(DatasetEvaluator):
    def __init__(self, dataset_name, distributed=True, output_dir=None):
        self._distributed = distributed
        self._output_dir = output_dir
        self._metadata = MetadataCatalog.get(dataset_name)
        from fsgd_tpu.data.cocoapi import COCO

        self._coco_api = COCO(self._metadata.json_file)

    def reset(self):
        self._predictions = []

    def process(self, inputs, outputs):
        for inp, out in zip(inputs, outputs):
            instances = out["instances"]
            if len(instances) == 0:
                continue
            boxes_xyxy = np.asarray(instances.pred_boxes.tensor)
            boxes_xywh = BoxMode.convert(boxes_xyxy, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
            dp_result = DensePoseResult.from_dets(instances.pred_densepose, boxes_xywh)
            self._predictions.extend(
                prediction_to_json(instances, dp_result, inp["image_id"])
            )

    def evaluate(self):
        if self._distributed:
            predictions = comm.gather(self._predictions, dst=0)
            predictions = list(itertools.chain(*predictions))
            if not comm.is_main_process():
                return {}
        else:
            predictions = self._predictions
        return copy.deepcopy(self._eval_predictions(predictions))

    def _eval_predictions(self, predictions):
        if self._output_dir:
            os.makedirs(self._output_dir, exist_ok=True)
            path = os.path.join(self._output_dir, "coco_densepose_results.json")
            with open(path, "w") as f:
                json.dump(
                    [
                        {k: v for k, v in p.items() if k != "densepose"}
                        for p in predictions
                    ],
                    f,
                )
        res = OrderedDict()
        res["densepose"] = _evaluate_predictions_on_coco(self._coco_api, predictions)
        return res


def prediction_to_json(instances, dp_result: DensePoseResult, img_id):
    """Reference evaluator.py:89-111."""
    scores = np.asarray(instances.scores).tolist()
    results = []
    for k in range(len(dp_result)):
        encoded, bbox_xywh = dp_result[k]
        results.append(
            {
                "image_id": img_id,
                "category_id": 1,  # densepose has a single person class
                "bbox": bbox_xywh,
                "score": scores[k],
                "densepose": (encoded, bbox_xywh),
            }
        )
    return results


def _evaluate_predictions_on_coco(coco_gt, coco_results):
    metrics = ["AP", "AP50", "AP75", "APm", "APl"]
    if len(coco_results) == 0:
        logger.warning("No predictions from the model! Set scores to -1")
        return {m: -1 for m in metrics}
    coco_dt = coco_gt.loadRes(coco_results)  # deep-copies, densepose payloads ride along
    coco_eval = DensePoseCocoEval(coco_gt, coco_dt, "densepose")
    coco_eval.evaluate()
    coco_eval.accumulate()
    coco_eval.summarize()
    results = {m: float(coco_eval.stats[i] * 100) for i, m in enumerate(metrics)}
    logger.info("DensePose evaluation: %s", results)
    return results
