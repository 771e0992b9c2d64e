"""Panoptic quality evaluation.

Parity with detectron2/evaluation/panoptic_evaluation.py: collects panoptic
segment predictions and computes PQ/SQ/RQ.  The PQ metric itself (normally
from the panopticapi package) is implemented here in numpy: segments match
when IoU > 0.5; PQ = sum(matched IoU) / (TP + FP/2 + FN/2).
"""

from __future__ import annotations

import itertools
import logging
from collections import OrderedDict, defaultdict

import numpy as np

from ..utils import comm
from .evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)

__all__ = ["COCOPanopticEvaluator", "pq_compute_single_image"]


def pq_compute_single_image(pan_gt, gt_segments, pan_pred, pred_segments, void_id=0):
    """Match predicted segments to GT segments at IoU > 0.5.

    pan_*: (H, W) int segment-id maps; *_segments: list of dicts with
    "id" and "category_id".  Returns per-category stats accumulators.
    """
    stats = defaultdict(lambda: {"iou": 0.0, "tp": 0, "fp": 0, "fn": 0})
    gt_by_id = {s["id"]: s for s in gt_segments}
    pred_by_id = {s["id"]: s for s in pred_segments}

    # joint histogram of (gt_id, pred_id) pairs
    combined = pan_gt.astype(np.int64) * (pan_pred.max() + 2) + pan_pred.astype(np.int64)
    ids, counts = np.unique(combined, return_counts=True)
    inter = {}
    for idx, c in zip(ids, counts):
        gt_id = int(idx // (pan_pred.max() + 2))
        pred_id = int(idx % (pan_pred.max() + 2))
        inter[(gt_id, pred_id)] = int(c)

    gt_areas = defaultdict(int)
    pred_areas = defaultdict(int)
    for (g, p), c in inter.items():
        gt_areas[g] += c
        pred_areas[p] += c

    matched_gt = set()
    matched_pred = set()
    for (g, p), c in inter.items():
        if g == void_id or p == void_id or g not in gt_by_id or p not in pred_by_id:
            continue
        if gt_by_id[g]["category_id"] != pred_by_id[p]["category_id"]:
            continue
        union = gt_areas[g] + pred_areas[p] - c - inter.get((void_id, p), 0)
        iou = c / union if union > 0 else 0.0
        if iou > 0.5:
            cat = gt_by_id[g]["category_id"]
            stats[cat]["iou"] += iou
            stats[cat]["tp"] += 1
            matched_gt.add(g)
            matched_pred.add(p)

    for g, seg in gt_by_id.items():
        if g not in matched_gt and g != void_id:
            stats[seg["category_id"]]["fn"] += 1
    for p, seg in pred_by_id.items():
        if p in matched_pred or p == void_id:
            continue
        # predictions mostly covering void are ignored
        void_overlap = inter.get((void_id, p), 0)
        if pred_areas[p] > 0 and void_overlap / pred_areas[p] > 0.5:
            continue
        stats[seg["category_id"]]["fp"] += 1
    return stats


def _merge_stats(all_stats):
    merged = defaultdict(lambda: {"iou": 0.0, "tp": 0, "fp": 0, "fn": 0})
    for stats in all_stats:
        for cat, s in stats.items():
            for k in s:
                merged[cat][k] += s[k]
    return merged


def _summarize_pq(merged):
    pqs, sqs, rqs = [], [], []
    for cat, s in merged.items():
        tp, fp, fn = s["tp"], s["fp"], s["fn"]
        if tp + fp + fn == 0:
            continue
        sq = s["iou"] / tp if tp else 0.0
        rq = tp / (tp + 0.5 * fp + 0.5 * fn)
        pqs.append(sq * rq)
        sqs.append(sq)
        rqs.append(rq)
    n = max(len(pqs), 1)
    return {
        "PQ": 100 * float(np.sum(pqs)) / n,
        "SQ": 100 * float(np.sum(sqs)) / n,
        "RQ": 100 * float(np.sum(rqs)) / n,
    }


class COCOPanopticEvaluator(DatasetEvaluator):
    """Evaluate PQ given per-image (panoptic_seg, segments_info) outputs and
    GT provided as ("pan_gt", "gt_segments") fields in the inputs (or via a
    GT loader callback)."""

    def __init__(self, dataset_name=None, output_dir=None, gt_loader=None):
        self._dataset_name = dataset_name
        self._output_dir = output_dir
        self._gt_loader = gt_loader
        self._stats = []

    def reset(self):
        self._stats = []

    def process(self, inputs, outputs):
        for input, output in zip(inputs, outputs):
            pan_pred, pred_segments = output["panoptic_seg"]
            if "pan_gt" in input:
                pan_gt, gt_segments = input["pan_gt"], input["gt_segments"]
            elif self._gt_loader is not None:
                pan_gt, gt_segments = self._gt_loader(input)
            else:
                continue
            self._stats.append(
                pq_compute_single_image(np.asarray(pan_gt), gt_segments, np.asarray(pan_pred), pred_segments)
            )

    def evaluate(self):
        comm.synchronize()
        all_stats = list(itertools.chain(*comm.gather(self._stats, dst=0)))
        if not comm.is_main_process():
            return {}
        if not all_stats:
            logger.warning("[COCOPanopticEvaluator] no panoptic GT available")
            return {}
        res = _summarize_pq(_merge_stats(all_stats))
        logger.info("Panoptic evaluation: %s", res)
        return OrderedDict({"panoptic_seg": res})
