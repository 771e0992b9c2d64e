"""Pascal VOC detection evaluator.

Parity with detectron2/evaluation/pascal_voc_evaluation.py (292 LoC): the
official VOC AP protocol — per-class greedy matching at IoU 0.5 with
difficult-object exclusion, 11-point interpolation for VOC2007 and
all-points for VOC2012.
"""

from __future__ import annotations

import logging
import os
import xml.etree.ElementTree as ET
from collections import OrderedDict, defaultdict

import numpy as np

from ..data.catalog import MetadataCatalog
from ..utils import comm
from .evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)

__all__ = ["PascalVOCDetectionEvaluator", "voc_ap", "voc_eval"]


def parse_rec(filename):
    tree = ET.parse(filename)
    objects = []
    for obj in tree.findall("object"):
        bbox = obj.find("bndbox")
        objects.append(
            {
                "name": obj.find("name").text,
                "difficult": int(obj.find("difficult").text),
                "bbox": [
                    int(bbox.find("xmin").text),
                    int(bbox.find("ymin").text),
                    int(bbox.find("xmax").text),
                    int(bbox.find("ymax").text),
                ],
            }
        )
    return objects


def voc_ap(rec, prec, use_07_metric=False):
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = 0.0 if np.sum(rec >= t) == 0 else np.max(prec[rec >= t])
            ap += p / 11.0
        return ap
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    i = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1]))


def voc_eval(detections, annotations, classname, ovthresh=0.5, use_07_metric=False):
    """
    Args:
        detections: list of (image_id, score, x1, y1, x2, y2) for this class.
        annotations: {image_id: list of objects} from parse_rec.
    """
    class_recs = {}
    npos = 0
    for imagename, objects in annotations.items():
        R = [obj for obj in objects if obj["name"] == classname]
        bbox = np.array([x["bbox"] for x in R])
        difficult = np.array([x["difficult"] for x in R]).astype(bool)
        det = [False] * len(R)
        npos += sum(~difficult)
        class_recs[imagename] = {"bbox": bbox, "difficult": difficult, "det": det}

    image_ids = [d[0] for d in detections]
    confidence = np.array([d[1] for d in detections])
    BB = np.array([d[2:] for d in detections]).reshape(-1, 4)

    sorted_ind = np.argsort(-confidence, kind="mergesort")
    BB = BB[sorted_ind]
    image_ids = [image_ids[x] for x in sorted_ind]

    nd = len(image_ids)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    for d in range(nd):
        R = class_recs.get(image_ids[d], {"bbox": np.zeros((0, 4)), "difficult": np.zeros(0, bool), "det": []})
        bb = BB[d]
        ovmax = -np.inf
        jmax = -1
        BBGT = R["bbox"]
        if BBGT.size > 0:
            ixmin = np.maximum(BBGT[:, 0], bb[0])
            iymin = np.maximum(BBGT[:, 1], bb[1])
            ixmax = np.minimum(BBGT[:, 2], bb[2])
            iymax = np.minimum(BBGT[:, 3], bb[3])
            iw = np.maximum(ixmax - ixmin + 1.0, 0.0)
            ih = np.maximum(iymax - iymin + 1.0, 0.0)
            inters = iw * ih
            uni = (
                (bb[2] - bb[0] + 1.0) * (bb[3] - bb[1] + 1.0)
                + (BBGT[:, 2] - BBGT[:, 0] + 1.0) * (BBGT[:, 3] - BBGT[:, 1] + 1.0)
                - inters
            )
            overlaps = inters / uni
            ovmax = np.max(overlaps)
            jmax = np.argmax(overlaps)
        if ovmax > ovthresh:
            if not R["difficult"][jmax]:
                if not R["det"][jmax]:
                    tp[d] = 1.0
                    R["det"][jmax] = True
                else:
                    fp[d] = 1.0
        else:
            fp[d] = 1.0

    fp = np.cumsum(fp)
    tp = np.cumsum(tp)
    rec = tp / float(max(npos, 1))
    prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    return rec, prec, voc_ap(rec, prec, use_07_metric)


class PascalVOCDetectionEvaluator(DatasetEvaluator):
    def __init__(self, dataset_name):
        self._dataset_name = dataset_name
        meta = MetadataCatalog.get(dataset_name)
        self._anno_file_template = os.path.join(meta.dirname, "Annotations", "{}.xml")
        self._class_names = meta.thing_classes
        self._is_2007 = meta.year == "2007"
        self._predictions = defaultdict(list)

    def reset(self):
        self._predictions = defaultdict(list)

    def process(self, inputs, outputs):
        for input, output in zip(inputs, outputs):
            image_id = input["image_id"]
            instances = output["instances"]
            boxes = np.asarray(instances.pred_boxes.tensor)
            scores = np.asarray(instances.scores)
            classes = np.asarray(instances.pred_classes)
            for box, score, cls in zip(boxes, scores, classes):
                xmin, ymin, xmax, ymax = box
                # VOC evaluation uses 1-indexed pixel coordinates
                self._predictions[int(cls)].append(
                    (image_id, float(score), xmin + 1, ymin + 1, xmax + 1, ymax + 1)
                )

    def evaluate(self):
        all_predictions = comm.gather(self._predictions, dst=0)
        if not comm.is_main_process():
            return {}
        predictions = defaultdict(list)
        for p in all_predictions:
            for k, v in p.items():
                predictions[k].extend(v)

        image_ids = sorted({d[0] for preds in predictions.values() for d in preds})
        annotations = {iid: parse_rec(self._anno_file_template.format(iid)) for iid in image_ids}

        aps = defaultdict(list)
        for cls_id, cls_name in enumerate(self._class_names):
            dets = predictions.get(cls_id, [])
            for thresh in range(50, 100, 5):
                _, _, ap = voc_eval(
                    dets, annotations, cls_name, ovthresh=thresh / 100.0, use_07_metric=self._is_2007
                )
                aps[thresh].append(ap * 100)

        ret = OrderedDict()
        mAP = {iou: np.mean(x) for iou, x in aps.items()}
        ret["bbox"] = {"AP": np.mean(list(mAP.values())), "AP50": mAP[50], "AP75": mAP[75]}
        return ret
