"""COCO-style AP evaluation in pure numpy (pycocotools.cocoeval replacement).

Implements the exact COCOeval algorithm — greedy score-ordered matching per
(image, category) with crowd/ignore semantics, 10 IoU thresholds, 101-point
interpolated precision, area ranges and maxDets — for bbox, segm (RLE IoU)
and keypoints (OKS).  Used by fsgd_tpu.evaluation.coco_evaluation in place of
the reference's pycocotools dependency (detectron2/evaluation/coco_evaluation.py).

The matching/accumulation control flow follows pycocotools' ``cocoeval.py``
(https://github.com/cocodataset/cocoapi, (c) 2014 Piotr Dollar and Tsung-Yi
Lin, BSD-2-Clause) closely — the COCOeval algorithm *is* the metric
definition, so ``evaluateImg``/``accumulate`` keep its structure and variable
naming to stay auditable against the canonical implementation.
"""

from __future__ import annotations

import copy
import logging
import time
from collections import defaultdict
from typing import Dict, List

import numpy as np

from ..data import rle as rle_codec

logger = logging.getLogger(__name__)

__all__ = ["COCOeval", "Params"]


class Params:
    def __init__(self, iouType="bbox"):
        self.imgIds: List[int] = []
        self.catIds: List[int] = []
        self.iouThrs = np.linspace(0.5, 0.95, int(np.round((0.95 - 0.5) / 0.05)) + 1)
        self.recThrs = np.linspace(0.0, 1.00, int(np.round((1.00 - 0.0) / 0.01)) + 1)
        if iouType == "keypoints":
            self.maxDets = [20]
            self.areaRng = [[0, 1e10], [32 ** 2, 96 ** 2], [96 ** 2, 1e10]]
            self.areaRngLbl = ["all", "medium", "large"]
            self.kpt_oks_sigmas = (
                np.array(
                    [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89]
                )
                / 10.0
            )
        else:
            self.maxDets = [1, 10, 100]
            self.areaRng = [[0, 1e10], [0, 32 ** 2], [32 ** 2, 96 ** 2], [96 ** 2, 1e10]]
            self.areaRngLbl = ["all", "small", "medium", "large"]
        self.useCats = 1
        self.iouType = iouType


def _bbox_iou_xywh(dets: np.ndarray, gts: np.ndarray, iscrowd: List[bool]) -> np.ndarray:
    """Pairwise IoU of xywh boxes; crowd gt uses intersection/det-area."""
    d, g = len(dets), len(gts)
    out = np.zeros((d, g), dtype=np.float64)
    if d == 0 or g == 0:
        return out
    dx1, dy1 = dets[:, 0], dets[:, 1]
    dx2, dy2 = dets[:, 0] + dets[:, 2], dets[:, 1] + dets[:, 3]
    gx1, gy1 = gts[:, 0], gts[:, 1]
    gx2, gy2 = gts[:, 0] + gts[:, 2], gts[:, 1] + gts[:, 3]
    iw = np.minimum(dx2[:, None], gx2[None, :]) - np.maximum(dx1[:, None], gx1[None, :])
    ih = np.minimum(dy2[:, None], gy2[None, :]) - np.maximum(dy1[:, None], gy1[None, :])
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    darea = dets[:, 2] * dets[:, 3]
    garea = gts[:, 2] * gts[:, 3]
    union = darea[:, None] + garea[None, :] - inter
    for j in range(g):
        if iscrowd[j]:
            union[:, j] = darea
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / union, 0.0)
    return iou


class COCOeval:
    def __init__(self, cocoGt=None, cocoDt=None, iouType="bbox"):
        self.cocoGt = cocoGt
        self.cocoDt = cocoDt
        self.params = Params(iouType)
        self.evalImgs = defaultdict(list)
        self.eval: Dict = {}
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        self.ious = {}
        self.stats = []
        if cocoGt is not None:
            self.params.imgIds = sorted(cocoGt.getImgIds())
            self.params.catIds = sorted(cocoGt.getCatIds())

    # -- preparation ---------------------------------------------------------
    def _prepare(self):
        p = self.params
        gts = self.cocoGt.loadAnns(self.cocoGt.getAnnIds(imgIds=p.imgIds, catIds=p.catIds if p.useCats else []))
        dts = self.cocoDt.loadAnns(self.cocoDt.getAnnIds(imgIds=p.imgIds, catIds=p.catIds if p.useCats else []))
        gts = copy.deepcopy(gts)
        if p.iouType == "segm":
            for ann in gts:
                ann["segmentation"] = self.cocoGt.annToRLE(ann)
            dts = copy.deepcopy(dts)
            for ann in dts:
                if isinstance(ann.get("segmentation"), (list,)):
                    ann["segmentation"] = self.cocoDt.annToRLE(ann)
        for gt in gts:
            gt["ignore"] = gt.get("ignore", 0) or gt.get("iscrowd", 0)
            if p.iouType == "keypoints":
                gt["ignore"] = (gt.get("num_keypoints", 0) == 0) or gt["ignore"]
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for gt in gts:
            self._gts[gt["image_id"], gt["category_id"]].append(gt)
        for dt in dts:
            self._dts[dt["image_id"], dt["category_id"]].append(dt)

    # -- IoU -----------------------------------------------------------------
    def computeIoU(self, imgId, catId):
        p = self.params
        if p.useCats:
            gt = self._gts[imgId, catId]
            dt = self._dts[imgId, catId]
        else:
            gt = [g for c in p.catIds for g in self._gts[imgId, c]]
            dt = [d for c in p.catIds for d in self._dts[imgId, c]]
        if len(gt) == 0 or len(dt) == 0:
            return np.zeros((len(dt), len(gt)))
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds]
        if len(dt) > p.maxDets[-1]:
            dt = dt[: p.maxDets[-1]]
        iscrowd = [int(g.get("iscrowd", 0)) for g in gt]
        if p.iouType == "segm":
            return rle_codec.rle_iou([d["segmentation"] for d in dt], [g["segmentation"] for g in gt], iscrowd)
        if p.iouType == "bbox":
            return _bbox_iou_xywh(
                np.array([d["bbox"] for d in dt], dtype=np.float64),
                np.array([g["bbox"] for g in gt], dtype=np.float64),
                iscrowd,
            )
        if p.iouType == "keypoints":
            return self.computeOks(imgId, catId)
        raise ValueError("unknown iouType")

    def computeOks(self, imgId, catId):
        p = self.params
        gts = self._gts[imgId, catId]
        dts = self._dts[imgId, catId]
        inds = np.argsort([-d["score"] for d in dts], kind="mergesort")
        dts = [dts[i] for i in inds][: p.maxDets[-1]]
        if len(gts) == 0 or len(dts) == 0:
            return np.zeros((len(dts), len(gts)))
        sigmas = p.kpt_oks_sigmas
        vars_ = (sigmas * 2) ** 2
        k = len(sigmas)
        ious = np.zeros((len(dts), len(gts)))
        for j, gt in enumerate(gts):
            g = np.array(gt["keypoints"])
            xg, yg, vg = g[0::3], g[1::3], g[2::3]
            k1 = np.count_nonzero(vg > 0)
            bb = gt["bbox"]
            x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
            y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
            for i, dt in enumerate(dts):
                d = np.array(dt["keypoints"])
                xd, yd = d[0::3], d[1::3]
                if k1 > 0:
                    dx = xd - xg
                    dy = yd - yg
                else:
                    zmax = np.zeros(k)
                    dx = np.maximum(zmax, x0 - xd) + np.maximum(zmax, xd - x1)
                    dy = np.maximum(zmax, y0 - yd) + np.maximum(zmax, yd - y1)
                e = (dx ** 2 + dy ** 2) / vars_ / (gt["area"] + np.spacing(1)) / 2
                if k1 > 0:
                    e = e[vg > 0]
                ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
        return ious

    # -- per-image evaluation ------------------------------------------------
    def evaluateImg(self, imgId, catId, aRng, maxDet):
        p = self.params
        gt = self._gts[imgId, catId]
        dt = self._dts[imgId, catId]
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            g["_ignore"] = 1 if (g["ignore"] or g["area"] < aRng[0] or g["area"] > aRng[1]) else 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[:maxDet]]
        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
        ious = self.ious[imgId, catId][:, gtind] if len(self.ious[imgId, catId]) > 0 else self.ious[imgId, catId]

        T = len(p.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if len(ious):
            for tind, t in enumerate(p.iouThrs):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        a = np.array([d["area"] < aRng[0] or d["area"] > aRng[1] for d in dt]).reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "image_id": imgId,
            "category_id": catId,
            "aRng": aRng,
            "maxDet": maxDet,
            "dtIds": [d["id"] for d in dt],
            "gtIds": [g["id"] for g in gt],
            "dtMatches": dtm,
            "gtMatches": gtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    def evaluate(self):
        tic = time.time()
        p = self.params
        p.imgIds = list(np.unique(p.imgIds))
        if p.useCats:
            p.catIds = list(np.unique(p.catIds))
        self.params = p
        self._prepare()
        catIds = p.catIds if p.useCats else [-1]
        self.ious = {
            (imgId, catId): self.computeIoU(imgId, catId) for imgId in p.imgIds for catId in catIds
        }
        maxDet = p.maxDets[-1]
        self.evalImgs = [
            self.evaluateImg(imgId, catId, areaRng, maxDet)
            for catId in catIds
            for areaRng in p.areaRng
            for imgId in p.imgIds
        ]
        self._paramsEval = copy.deepcopy(self.params)
        logger.info("COCOeval evaluate done in %.2fs", time.time() - tic)

    # -- accumulation --------------------------------------------------------
    def accumulate(self, p=None):
        tic = time.time()
        if p is None:
            p = self.params
        p.catIds = p.catIds if p.useCats == 1 else [-1]
        T = len(p.iouThrs)
        R = len(p.recThrs)
        K = len(p.catIds)
        A = len(p.areaRng)
        M = len(p.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        scores = -np.ones((T, R, K, A, M))

        _pe = self._paramsEval
        setK = set(_pe.catIds)
        setA = set(map(tuple, _pe.areaRng))
        setM = set(_pe.maxDets)
        setI = set(_pe.imgIds)
        k_list = [n for n, k in enumerate(p.catIds) if k in setK]
        m_list = [m for n, m in enumerate(p.maxDets) if m in setM]
        a_list = [n for n, a in enumerate(map(lambda x: tuple(x), p.areaRng)) if a in setA]
        i_list = [n for n, i in enumerate(p.imgIds) if i in setI]
        I0 = len(_pe.imgIds)
        A0 = len(_pe.areaRng)
        for k, k0 in enumerate(k_list):
            Nk = k0 * A0 * I0
            for a, a0 in enumerate(a_list):
                Na = a0 * I0
                for m, maxDet in enumerate(m_list):
                    E = [self.evalImgs[Nk + Na + i] for i in i_list]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dtScores = np.concatenate([e["dtScores"][0:maxDet] for e in E])
                    inds = np.argsort(-dtScores, kind="mergesort")
                    dtScoresSorted = dtScores[inds]
                    dtm = np.concatenate([e["dtMatches"][:, 0:maxDet] for e in E], axis=1)[:, inds]
                    dtIg = np.concatenate([e["dtIgnore"][:, 0:maxDet] for e in E], axis=1)[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(np.logical_not(dtm), np.logical_not(dtIg))
                    tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        ss = np.zeros((R,))
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds_r = np.searchsorted(rc, p.recThrs, side="left")
                        try:
                            for ri, pi in enumerate(inds_r):
                                q[ri] = pr[pi]
                                ss[ri] = dtScoresSorted[pi]
                        except IndexError:
                            pass
                        precision[t, :, k, a, m] = np.array(q)
                        scores[t, :, k, a, m] = np.array(ss)
        self.eval = {
            "params": p,
            "counts": [T, R, K, A, M],
            "precision": precision,
            "recall": recall,
            "scores": scores,
        }
        logger.info("COCOeval accumulate done in %.2fs", time.time() - tic)

    # -- summary -------------------------------------------------------------
    def _summarize(self, ap=1, iouThr=None, areaRng="all", maxDets=100):
        p = self.params
        aind = [i for i, a in enumerate(p.areaRngLbl) if a == areaRng]
        mind = [i for i, m in enumerate(p.maxDets) if m == maxDets]
        if ap == 1:
            s = self.eval["precision"]
            if iouThr is not None:
                t = np.where(np.abs(iouThr - p.iouThrs) < 1e-9)[0]
                s = s[t]
            s = s[:, :, :, aind, mind]
        else:
            s = self.eval["recall"]
            if iouThr is not None:
                t = np.where(np.abs(iouThr - p.iouThrs) < 1e-9)[0]
                s = s[t]
            s = s[:, :, aind, mind]
        if len(s[s > -1]) == 0:
            return -1.0
        return float(np.mean(s[s > -1]))

    def summarize(self):
        p = self.params
        if p.iouType == "keypoints":
            md = p.maxDets[-1]
            self.stats = np.array(
                [
                    self._summarize(1, maxDets=md),
                    self._summarize(1, iouThr=0.5, maxDets=md),
                    self._summarize(1, iouThr=0.75, maxDets=md),
                    self._summarize(1, areaRng="medium", maxDets=md),
                    self._summarize(1, areaRng="large", maxDets=md),
                    self._summarize(0, maxDets=md),
                    self._summarize(0, iouThr=0.5, maxDets=md),
                    self._summarize(0, iouThr=0.75, maxDets=md),
                    self._summarize(0, areaRng="medium", maxDets=md),
                    self._summarize(0, areaRng="large", maxDets=md),
                ]
            )
        else:
            self.stats = np.array(
                [
                    self._summarize(1),
                    self._summarize(1, iouThr=0.5, maxDets=p.maxDets[2]),
                    self._summarize(1, iouThr=0.75, maxDets=p.maxDets[2]),
                    self._summarize(1, areaRng="small", maxDets=p.maxDets[2]),
                    self._summarize(1, areaRng="medium", maxDets=p.maxDets[2]),
                    self._summarize(1, areaRng="large", maxDets=p.maxDets[2]),
                    self._summarize(0, maxDets=p.maxDets[0]),
                    self._summarize(0, maxDets=p.maxDets[1]),
                    self._summarize(0, maxDets=p.maxDets[2]),
                    self._summarize(0, areaRng="small", maxDets=p.maxDets[2]),
                    self._summarize(0, areaRng="medium", maxDets=p.maxDets[2]),
                    self._summarize(0, areaRng="large", maxDets=p.maxDets[2]),
                ]
            )
        return self.stats
