"""COCO evaluator.

Parity with detectron2/evaluation/coco_evaluation.py:1-551: collect per-image
predictions as COCO-json records (``instances_to_coco_json``, :344-407),
gather across processes, run COCOeval (our numpy implementation), derive the
standard AP table + per-category APs (``_derive_coco_results``), proposal AR
evaluation (:224,408), and the fork's ``evaluate_from_file`` (:111-145).
"""

from __future__ import annotations

import copy
import itertools
import json
import logging
import os
from collections import OrderedDict
from typing import List, Optional

import numpy as np

from ..data import rle as rle_codec
from ..data.catalog import MetadataCatalog
from ..data.cocoapi import COCO
from ..utils import comm
from .cocoeval import COCOeval
from .evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)

__all__ = ["COCOEvaluator", "instances_to_coco_json"]


def instances_to_coco_json(instances, img_id) -> List[dict]:
    """Convert Instances (boxes/scores/classes [+masks/keypoints]) to records."""
    from ..structures import BoxMode

    num_instance = len(instances)
    if num_instance == 0:
        return []

    boxes = np.asarray(instances.pred_boxes.tensor)
    boxes = BoxMode.convert(boxes, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
    scores = np.asarray(instances.scores).tolist()
    classes = np.asarray(instances.pred_classes).tolist()

    has_mask = instances.has("pred_masks") or instances.has("pred_masks_soft")
    rles = None
    if has_mask:
        if instances.has("pred_masks"):
            masks = np.asarray(instances.pred_masks)
            rles = [rle_codec.encode(np.asarray(m, np.uint8, order="F")) for m in masks]
        else:
            # soft (M, M) probabilities: paste into full image first
            from ..ops.paste_masks import paste_masks_in_image

            soft = np.asarray(instances.pred_masks_soft)
            h, w = instances.image_size
            # TensorMask masks live on anchor boxes (pred_mask_boxes), not
            # the regressed boxes (reference TensorMask/arch.py:700-731)
            frame = (
                instances.pred_mask_boxes
                if instances.has("pred_mask_boxes")
                else instances.pred_boxes
            )
            pasted = paste_masks_in_image(soft, np.asarray(frame.tensor), (h, w))
            rles = [rle_codec.encode(m) for m in pasted]
        for r in rles:
            r["counts"] = r["counts"].decode("utf-8")

    has_keypoints = instances.has("pred_keypoints")

    results = []
    for k in range(num_instance):
        result = {
            "image_id": img_id,
            "category_id": int(classes[k]),
            "bbox": [float(x) for x in boxes[k]],
            "score": float(scores[k]),
        }
        if rles is not None:
            result["segmentation"] = rles[k]
        if has_keypoints:
            kp = np.asarray(instances.pred_keypoints[k])  # (K, 4): x, y, logit, prob
            kp_out = np.zeros((kp.shape[0], 3))
            kp_out[:, 0] = kp[:, 0] - 0.5  # back to COCO integer-pixel convention
            kp_out[:, 1] = kp[:, 1] - 0.5
            kp_out[:, 2] = 2
            result["keypoints"] = kp_out.reshape(-1).tolist()
        results.append(result)
    return results


class COCOEvaluator(DatasetEvaluator):
    def __init__(self, dataset_name, cfg=None, distributed=True, output_dir=None):
        self._dataset_name = dataset_name
        self._distributed = distributed
        self._output_dir = output_dir
        self._metadata = MetadataCatalog.get(dataset_name)
        self._kpt_oks_sigmas = None
        if cfg is not None and len(cfg.TEST.KEYPOINT_OKS_SIGMAS):
            self._kpt_oks_sigmas = np.array(cfg.TEST.KEYPOINT_OKS_SIGMAS)

        json_file = self._metadata.get("json_file")
        if json_file is None:
            from ..data.datasets.coco import convert_to_coco_json

            json_file = os.path.join(output_dir or ".", "{}_coco_format.json".format(dataset_name))
            convert_to_coco_json(dataset_name, json_file)
            self._metadata.json_file = json_file
        self._coco_api = COCO(json_file)
        self._do_evaluation = "annotations" in self._coco_api.dataset and len(
            self._coco_api.dataset["annotations"]
        )
        self._tasks = None
        if cfg is not None:
            tasks = ["bbox"]
            if cfg.MODEL.MASK_ON:
                tasks.append("segm")
            if cfg.MODEL.KEYPOINT_ON:
                tasks.append("keypoints")
            self._tasks = tuple(tasks)
        self._predictions = []

    def reset(self):
        self._predictions = []

    def process(self, inputs, outputs):
        for input, output in zip(inputs, outputs):
            prediction = {"image_id": input["image_id"]}
            if "instances" in output:
                prediction["instances"] = instances_to_coco_json(
                    output["instances"], input["image_id"]
                )
            if "proposals" in output:
                p = output["proposals"]
                prediction["proposals"] = {
                    "boxes": np.asarray(p.proposal_boxes.tensor).tolist(),
                    "objectness_logits": np.asarray(p.objectness_logits).tolist(),
                }
            self._predictions.append(prediction)

    def _tasks_from_predictions(self, predictions):
        tasks = {"bbox"}
        for pred in predictions:
            if "segmentation" in pred:
                tasks.add("segm")
            if "keypoints" in pred:
                tasks.add("keypoints")
        return sorted(tasks)

    def evaluate(self):
        if self._distributed:
            comm.synchronize()
            predictions = comm.gather(self._predictions, dst=0)
            predictions = list(itertools.chain(*predictions))
            if not comm.is_main_process():
                return {}
        else:
            predictions = self._predictions
        if len(predictions) == 0:
            logger.warning("[COCOEvaluator] Did not receive valid predictions.")
            return {}

        results = OrderedDict()
        if "proposals" in predictions[0]:
            results.update(self._eval_box_proposals(predictions))
        if "instances" in predictions[0]:
            coco_results = list(itertools.chain(*[x["instances"] for x in predictions]))
            results.update(self._eval_predictions(coco_results))
        return copy.deepcopy(results)

    def evaluate_from_file(self, json_path: str):
        """Fork addition (coco_evaluation.py:111-145): evaluate a dumped
        prediction file without re-running inference."""
        with open(json_path) as f:
            coco_results = json.load(f)
        return self._eval_predictions(coco_results)

    def _eval_predictions(self, coco_results):
        # map contiguous category ids back to dataset ids
        reverse_id_mapping = None
        if self._metadata.get("thing_dataset_id_to_contiguous_id") is not None:
            reverse_id_mapping = {
                v: k for k, v in self._metadata.thing_dataset_id_to_contiguous_id.items()
            }
        if reverse_id_mapping:
            for result in coco_results:
                result["category_id"] = reverse_id_mapping.get(
                    result["category_id"], result["category_id"]
                )

        if self._output_dir:
            os.makedirs(self._output_dir, exist_ok=True)
            file_path = os.path.join(self._output_dir, "coco_instances_results.json")
            with open(file_path, "w") as f:
                json.dump(coco_results, f)

        results = OrderedDict()
        if not self._do_evaluation:
            logger.info("Annotations are not available for evaluation.")
            return results

        tasks = self._tasks or self._tasks_from_predictions(coco_results)
        for task in tasks:
            task_results = coco_results
            if task == "keypoints":
                task_results = [r for r in coco_results if "keypoints" in r]
            if task == "segm":
                task_results = [r for r in coco_results if "segmentation" in r]
            if len(task_results) == 0:
                results[task] = {}
                continue
            coco_dt = self._coco_api.loadRes(task_results)
            coco_eval = COCOeval(self._coco_api, coco_dt, task)
            if task == "keypoints" and self._kpt_oks_sigmas is not None:
                coco_eval.params.kpt_oks_sigmas = self._kpt_oks_sigmas
            coco_eval.evaluate()
            coco_eval.accumulate()
            coco_eval.summarize()
            results[task] = self._derive_coco_results(coco_eval, task)
        return results

    def _derive_coco_results(self, coco_eval, iou_type):
        metrics = {
            "bbox": ["AP", "AP50", "AP75", "APs", "APm", "APl"],
            "segm": ["AP", "AP50", "AP75", "APs", "APm", "APl"],
            "keypoints": ["AP", "AP50", "AP75", "APm", "APl"],
        }[iou_type]
        results = {
            metric: float(coco_eval.stats[idx] * 100 if coco_eval.stats[idx] >= 0 else "nan")
            for idx, metric in enumerate(metrics)
        }
        logger.info("Evaluation results for %s: %s", iou_type, results)

        # per-category AP
        class_names = self._metadata.get("thing_classes")
        if class_names is not None:
            precisions = coco_eval.eval["precision"]
            results_per_category = []
            for idx, name in enumerate(class_names):
                if idx >= precisions.shape[2]:
                    break
                precision = precisions[:, :, idx, 0, -1]
                precision = precision[precision > -1]
                ap = np.mean(precision) if precision.size else float("nan")
                results_per_category.append(("{}".format(name), float(ap * 100)))
            results.update({"AP-" + name: ap for name, ap in results_per_category})
        return results

    def _eval_box_proposals(self, predictions):
        """AR@{100,1000} over areas (reference coco_evaluation.py:224,408-520)."""
        res = {}
        areas = {"all": "", "small": "s", "medium": "m", "large": "l"}
        for limit in [100, 1000]:
            for area, suffix in areas.items():
                stats = _evaluate_box_proposals(predictions, self._coco_api, area=area, limit=limit)
                key = "AR{}@{:d}".format(suffix, limit)
                res[key] = float(stats["ar"] * 100)
        logger.info("Proposal metrics: %s", res)
        return {"box_proposals": res}


def _evaluate_box_proposals(predictions, coco_api, thresholds=None, area="all", limit=None):
    """Official recall-of-proposals protocol (reference coco_evaluation.py:408-520)."""
    areas = {"all": 0, "small": 1, "medium": 2, "large": 3, "96-128": 4, "128-256": 5, "256-512": 6, "512-inf": 7}
    area_ranges = [
        [0 ** 2, 1e5 ** 2], [0 ** 2, 32 ** 2], [32 ** 2, 96 ** 2], [96 ** 2, 1e5 ** 2],
        [96 ** 2, 128 ** 2], [128 ** 2, 256 ** 2], [256 ** 2, 512 ** 2], [512 ** 2, 1e5 ** 2],
    ]
    assert area in areas
    area_range = area_ranges[areas[area]]
    gt_overlaps = []
    num_pos = 0
    from ..structures import Boxes, BoxMode, pairwise_iou

    for prediction_dict in predictions:
        if "proposals" not in prediction_dict:
            continue
        boxes = np.asarray(prediction_dict["proposals"]["boxes"], dtype=np.float32).reshape(-1, 4)
        logits = np.asarray(prediction_dict["proposals"]["objectness_logits"], dtype=np.float32)
        inds = np.argsort(-logits, kind="mergesort")
        boxes = boxes[inds]
        if limit is not None and len(boxes) > limit:
            boxes = boxes[:limit]

        ann_ids = coco_api.getAnnIds(imgIds=prediction_dict["image_id"])
        anno = coco_api.loadAnns(ann_ids)
        gt_boxes = [
            BoxMode.convert(obj["bbox"], BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
            for obj in anno
            if obj.get("iscrowd", 0) == 0
        ]
        gt_areas = np.array([obj["area"] for obj in anno if obj.get("iscrowd", 0) == 0])
        gt_boxes = np.asarray(gt_boxes, dtype=np.float32).reshape(-1, 4)
        valid_gt = (gt_areas >= area_range[0]) & (gt_areas <= area_range[1]) if len(gt_areas) else np.zeros(0, bool)
        gt_boxes = gt_boxes[valid_gt]
        num_pos += len(gt_boxes)
        if len(gt_boxes) == 0 or len(boxes) == 0:
            continue

        overlaps = np.asarray(pairwise_iou(Boxes(boxes), Boxes(gt_boxes)))
        _gt_overlaps = np.zeros(len(gt_boxes))
        for j in range(min(len(boxes), len(gt_boxes))):
            max_overlaps = overlaps.max(axis=0)
            argmax_overlaps = overlaps.argmax(axis=0)
            gt_ovr = max_overlaps.argmax()
            gt_ovr_val = max_overlaps[gt_ovr]
            assert gt_ovr_val >= 0
            box_ind = argmax_overlaps[gt_ovr]
            _gt_overlaps[j] = overlaps[box_ind, gt_ovr]
            overlaps[box_ind, :] = -1
            overlaps[:, gt_ovr] = -1
        gt_overlaps.append(_gt_overlaps)

    gt_overlaps = np.concatenate(gt_overlaps, axis=0) if gt_overlaps else np.zeros(0, dtype=np.float32)
    gt_overlaps = np.sort(gt_overlaps)
    if thresholds is None:
        step = 0.05
        thresholds = np.arange(0.5, 0.95 + 1e-5, step)
    recalls = np.zeros_like(thresholds)
    for i, t in enumerate(thresholds):
        recalls[i] = (gt_overlaps >= t).sum() / float(num_pos) if num_pos else 0.0
    ar = recalls.mean()
    return {"ar": ar, "recalls": recalls, "thresholds": thresholds, "gt_overlaps": gt_overlaps, "num_pos": num_pos}
