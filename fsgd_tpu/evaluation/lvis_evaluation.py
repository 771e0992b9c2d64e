"""LVIS evaluator.

Parity with detectron2/evaluation/lvis_evaluation.py:21-219 (+ the fork's
``evaluate_from_file``).  The LVIS protocol differs from COCO in: 300
detections per image, no score threshold, per-image ``neg_category_ids`` /
``not_exhaustive_category_ids`` ignore handling, and APr/APc/APf frequency
buckets.  Implemented on top of our numpy COCOeval with an LVIS-parameterized
subclass (the lvis-api package is not a dependency).
"""

from __future__ import annotations

import copy
import itertools
import json
import logging
import os
from collections import OrderedDict, defaultdict

import numpy as np

from ..data.catalog import MetadataCatalog
from ..data.cocoapi import COCO
from ..utils import comm
from .cocoeval import COCOeval, Params
from .coco_evaluation import instances_to_coco_json
from .evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)

__all__ = ["LVISEvaluator", "LVISEval"]


class LVISEval(COCOeval):
    """COCOeval with LVIS parameters and per-image category ignores."""

    def __init__(self, cocoGt, cocoDt, iouType="bbox"):
        super().__init__(cocoGt, cocoDt, iouType)
        if iouType != "keypoints":
            self.params.maxDets = [300]
        # per-image sets of categories that must not generate penalties
        self._img_nel = {
            img["id"]: set(img.get("neg_category_ids", [])) | set(img.get("not_exhaustive_category_ids", []))
            for img in cocoGt.dataset.get("images", [])
        }

    def evaluateImg(self, imgId, catId, aRng, maxDet):
        out = super().evaluateImg(imgId, catId, aRng, maxDet)
        if out is None:
            return out
        # detections of a category the image was not exhaustively annotated
        # for are ignored rather than counted as FP (LVIS protocol)
        if catId in self._img_nel.get(imgId, ()):  # pragma: no cover - data dependent
            dtm = out["dtMatches"]
            out["dtIgnore"] = np.logical_or(out["dtIgnore"], dtm == 0)
        return out

    def summarize(self):
        p = self.params
        md = p.maxDets[-1]
        self.stats = np.array(
            [
                self._summarize(1, maxDets=md),
                self._summarize(1, iouThr=0.5, maxDets=md),
                self._summarize(1, iouThr=0.75, maxDets=md),
                self._summarize(1, areaRng="small", maxDets=md),
                self._summarize(1, areaRng="medium", maxDets=md),
                self._summarize(1, areaRng="large", maxDets=md),
            ]
        )
        return self.stats


class LVISEvaluator(DatasetEvaluator):
    def __init__(self, dataset_name, cfg=None, distributed=True, output_dir=None):
        self._dataset_name = dataset_name
        self._distributed = distributed
        self._output_dir = output_dir
        self._metadata = MetadataCatalog.get(dataset_name)
        json_file = self._metadata.json_file
        self._lvis_api = COCO(json_file)
        # LVIS jsons carry no "iscrowd"; COCO api handles absence fine
        self._do_evaluation = len(self._lvis_api.dataset.get("annotations", []))
        self._predictions = []
        self._tasks = ("bbox", "segm") if (cfg is not None and cfg.MODEL.MASK_ON) else ("bbox",)

    def reset(self):
        self._predictions = []

    def process(self, inputs, outputs):
        for input, output in zip(inputs, outputs):
            prediction = {"image_id": input["image_id"]}
            if "instances" in output:
                prediction["instances"] = instances_to_coco_json(output["instances"], input["image_id"])
            self._predictions.append(prediction)

    def evaluate(self):
        if self._distributed:
            comm.synchronize()
            predictions = list(itertools.chain(*comm.gather(self._predictions, dst=0)))
            if not comm.is_main_process():
                return {}
        else:
            predictions = self._predictions
        if len(predictions) == 0:
            logger.warning("[LVISEvaluator] Did not receive valid predictions.")
            return {}
        lvis_results = list(itertools.chain(*[x["instances"] for x in predictions]))
        return self._eval_predictions(lvis_results)

    def evaluate_from_file(self, json_path):
        with open(json_path) as f:
            return self._eval_predictions(json.load(f))

    def _eval_predictions(self, lvis_results):
        # LVIS category ids are contiguous-1-indexed; undo the loader's -1
        for result in lvis_results:
            result["category_id"] += 1
        if self._output_dir:
            os.makedirs(self._output_dir, exist_ok=True)
            with open(os.path.join(self._output_dir, "lvis_instances_results.json"), "w") as f:
                json.dump(lvis_results, f)
        results = OrderedDict()
        if not self._do_evaluation:
            return results
        for task in self._tasks:
            task_results = lvis_results
            if task == "segm":
                task_results = [r for r in lvis_results if "segmentation" in r]
                if not task_results:
                    results[task] = {}
                    continue
            lvis_dt = self._lvis_api.loadRes(copy.deepcopy(task_results))
            lvis_eval = LVISEval(self._lvis_api, lvis_dt, task)
            lvis_eval.evaluate()
            lvis_eval.accumulate()
            lvis_eval.summarize()
            metrics = ["AP", "AP50", "AP75", "APs", "APm", "APl"]
            res = {m: float(lvis_eval.stats[i] * 100) for i, m in enumerate(metrics)}
            res.update(self._frequency_buckets(lvis_eval))
            logger.info("LVIS %s results: %s", task, res)
            results[task] = res
        return results

    def _frequency_buckets(self, lvis_eval):
        """APr / APc / APf by category image frequency (LVIS convention)."""
        cats = self._lvis_api.dataset.get("categories", [])
        freq = {}
        for c in cats:
            f = c.get("frequency")
            if f is None:
                n = c.get("image_count", 0)
                f = "r" if n < 10 else ("c" if n < 100 else "f")
            freq[c["id"]] = f
        precision = lvis_eval.eval.get("precision")
        if precision is None:
            return {}
        out = {}
        cat_ids = lvis_eval.params.catIds
        for bucket in ("r", "c", "f"):
            idxs = [i for i, cid in enumerate(cat_ids) if freq.get(cid) == bucket]
            if not idxs:
                continue
            p = precision[:, :, idxs, 0, -1]
            p = p[p > -1]
            out["AP" + bucket] = float(np.mean(p) * 100) if p.size else float("nan")
        return out
