"""Semantic segmentation evaluator (parity with
detectron2/evaluation/sem_seg_evaluation.py): confusion-matrix mIoU, fwIoU,
mACC, pACC over predicted label maps vs GT label files."""

from __future__ import annotations

import itertools
import logging
import os
from collections import OrderedDict

import numpy as np

from ..data.catalog import DatasetCatalog, MetadataCatalog
from ..utils import comm
from .evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)

__all__ = ["SemSegEvaluator"]


class SemSegEvaluator(DatasetEvaluator):
    def __init__(self, dataset_name, distributed=True, num_classes=None, ignore_label=255, output_dir=None):
        self._dataset_name = dataset_name
        self._distributed = distributed
        self._output_dir = output_dir
        meta = MetadataCatalog.get(dataset_name)
        self._num_classes = num_classes or len(meta.get("stuff_classes", []) or meta.get("thing_classes", []))
        self._ignore_label = ignore_label
        self._gt_files = {
            d["file_name"]: d["sem_seg_file_name"] for d in DatasetCatalog.get(dataset_name)
        }
        self._conf_matrix = None

    def reset(self):
        self._conf_matrix = np.zeros((self._num_classes + 1, self._num_classes + 1), dtype=np.int64)

    def process(self, inputs, outputs):
        from PIL import Image

        for input, output in zip(inputs, outputs):
            pred = np.asarray(output["sem_seg"], dtype=np.int64)
            if pred.ndim == 3:  # logits (H, W, C)
                pred = pred.argmax(axis=-1)
            gt_file = input.get("sem_seg_file_name") or self._gt_files[input["file_name"]]
            gt = np.asarray(Image.open(gt_file), dtype=np.int64)
            gt[gt == self._ignore_label] = self._num_classes
            self._conf_matrix += np.bincount(
                self._num_classes * pred.reshape(-1) + gt.reshape(-1),
                minlength=self._conf_matrix.size,
            ).reshape(self._conf_matrix.shape)

    def evaluate(self):
        if self._distributed:
            comm.synchronize()
            conf_list = comm.gather(self._conf_matrix, dst=0)
            if not comm.is_main_process():
                return {}
            self._conf_matrix = sum(conf_list)

        acc = np.full(self._num_classes, np.nan, dtype=np.float64)
        iou = np.full(self._num_classes, np.nan, dtype=np.float64)
        tp = self._conf_matrix.diagonal()[:-1].astype(np.float64)
        pos_gt = np.sum(self._conf_matrix[:-1, :-1], axis=0).astype(np.float64)
        pos_pred = np.sum(self._conf_matrix[:-1, :-1], axis=1).astype(np.float64)
        class_weights = pos_gt / max(np.sum(pos_gt), 1)
        acc_valid = pos_gt > 0
        acc[acc_valid] = tp[acc_valid] / pos_gt[acc_valid]
        iou_valid = (pos_gt + pos_pred) > 0
        union = pos_gt + pos_pred - tp
        iou[iou_valid] = tp[iou_valid] / union[iou_valid]

        macc = np.sum(acc[acc_valid]) / max(np.sum(acc_valid), 1)
        miou = np.sum(iou[iou_valid]) / max(np.sum(iou_valid), 1)
        fiou = np.sum(iou[iou_valid] * class_weights[iou_valid])
        pacc = np.sum(tp) / max(np.sum(pos_gt), 1)

        res = {
            "mIoU": 100 * miou,
            "fwIoU": 100 * fiou,
            "mACC": 100 * macc,
            "pACC": 100 * pacc,
        }
        logger.info("SemSeg evaluation: %s", res)
        return OrderedDict({"sem_seg": res})
