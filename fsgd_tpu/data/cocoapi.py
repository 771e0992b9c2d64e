"""Minimal COCO annotation-file API (replaces pycocotools.coco.COCO).

Indexes a COCO-format JSON: image/annotation/category lookup with the subset
of the pycocotools surface used by the loaders and evaluator
(``getImgIds/getCatIds/getAnnIds/loadImgs/loadAnns/loadCats/imgToAnns``,
``loadRes`` for detection results, ``annToRLE/annToMask``).
"""

from __future__ import annotations

import copy
import json
import logging
import time
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from . import rle as rle_codec

logger = logging.getLogger(__name__)

__all__ = ["COCO"]


class COCO:
    def __init__(self, annotation_file: Optional[str] = None):
        self.dataset: Dict = {}
        self.anns: Dict[int, Dict] = {}
        self.imgs: Dict[int, Dict] = {}
        self.cats: Dict[int, Dict] = {}
        self.imgToAnns = defaultdict(list)
        self.catToImgs = defaultdict(list)
        if annotation_file is not None:
            t0 = time.time()
            with open(annotation_file, "r") as f:
                self.dataset = json.load(f)
            assert isinstance(self.dataset, dict)
            logger.info("Loaded %s in %.2fs", annotation_file, time.time() - t0)
            self.createIndex()

    def createIndex(self):
        anns, cats, imgs = {}, {}, {}
        img_to_anns, cat_to_imgs = defaultdict(list), defaultdict(list)
        for ann in self.dataset.get("annotations", []):
            img_to_anns[ann["image_id"]].append(ann)
            anns[ann["id"]] = ann
        for img in self.dataset.get("images", []):
            imgs[img["id"]] = img
        for cat in self.dataset.get("categories", []):
            cats[cat["id"]] = cat
        for ann in self.dataset.get("annotations", []):
            cat_to_imgs[ann["category_id"]].append(ann["image_id"])
        self.anns, self.imgs, self.cats = anns, imgs, cats
        self.imgToAnns, self.catToImgs = img_to_anns, cat_to_imgs

    # -- queries -------------------------------------------------------------
    def getAnnIds(self, imgIds=[], catIds=[], areaRng=[], iscrowd=None) -> List[int]:
        imgIds = imgIds if isinstance(imgIds, (list, tuple)) else [imgIds]
        catIds = catIds if isinstance(catIds, (list, tuple)) else [catIds]
        if len(imgIds):
            anns = [a for i in imgIds for a in self.imgToAnns[i]]
        else:
            anns = list(self.anns.values())
        if len(catIds):
            cat_set = set(catIds)
            anns = [a for a in anns if a["category_id"] in cat_set]
        if len(areaRng):
            anns = [a for a in anns if areaRng[0] < a["area"] < areaRng[1]]
        if iscrowd is not None:
            anns = [a for a in anns if a.get("iscrowd", 0) == iscrowd]
        return [a["id"] for a in anns]

    def getCatIds(self, catNms=[], supNms=[], catIds=[]) -> List[int]:
        cats = list(self.cats.values())
        if len(catNms):
            cats = [c for c in cats if c["name"] in catNms]
        if len(supNms):
            cats = [c for c in cats if c.get("supercategory") in supNms]
        if len(catIds):
            cats = [c for c in cats if c["id"] in catIds]
        return sorted(c["id"] for c in cats)

    def getImgIds(self, imgIds=[], catIds=[]) -> List[int]:
        imgIds = imgIds if isinstance(imgIds, (list, tuple)) else [imgIds]
        catIds = catIds if isinstance(catIds, (list, tuple)) else [catIds]
        if not imgIds and not catIds:
            return sorted(self.imgs.keys())
        ids = set(imgIds) if imgIds else set(self.imgs.keys())
        for i, cat_id in enumerate(catIds):
            imgs_with_cat = set(self.catToImgs[cat_id])
            ids = imgs_with_cat if (i == 0 and not imgIds) else ids & imgs_with_cat
        return sorted(ids)

    def loadAnns(self, ids=[]):
        ids = ids if isinstance(ids, (list, tuple)) else [ids]
        return [self.anns[i] for i in ids]

    def loadCats(self, ids=[]):
        ids = ids if isinstance(ids, (list, tuple)) else [ids]
        return [self.cats[i] for i in ids]

    def loadImgs(self, ids=[]):
        ids = ids if isinstance(ids, (list, tuple)) else [ids]
        return [self.imgs[i] for i in ids]

    # -- results -------------------------------------------------------------
    def loadRes(self, results) -> "COCO":
        """Build a result COCO from a list of detection dicts (or a json path)."""
        res = COCO()
        res.dataset["images"] = [img for img in self.dataset.get("images", [])]
        if isinstance(results, str):
            with open(results) as f:
                anns = json.load(f)
        else:
            anns = copy.deepcopy(list(results))
        assert isinstance(anns, list)
        if len(anns) == 0:
            res.dataset["annotations"] = []
            res.dataset["categories"] = copy.deepcopy(self.dataset.get("categories", []))
            res.createIndex()
            return res

        ann_img_ids = {a["image_id"] for a in anns}
        assert ann_img_ids <= set(self.getImgIds()), "Results reference unknown image ids"
        if "bbox" in anns[0] and anns[0].get("bbox") is not None:
            for aid, ann in enumerate(anns):
                bb = ann["bbox"]
                if "segmentation" not in ann:
                    ann["segmentation"] = [
                        [bb[0], bb[1], bb[0], bb[1] + bb[3], bb[0] + bb[2], bb[1] + bb[3], bb[0] + bb[2], bb[1]]
                    ]
                ann["area"] = bb[2] * bb[3]
                ann["id"] = aid + 1
                ann["iscrowd"] = 0
        elif "segmentation" in anns[0]:
            for aid, ann in enumerate(anns):
                ann["area"] = rle_codec.area(ann["segmentation"])
                ann["bbox"] = rle_codec.to_bbox(ann["segmentation"]).tolist()
                ann["id"] = aid + 1
                ann["iscrowd"] = 0
        elif "keypoints" in anns[0]:
            for aid, ann in enumerate(anns):
                kp = np.asarray(ann["keypoints"])
                xs, ys = kp[0::3], kp[1::3]
                x0, x1, y0, y1 = xs.min(), xs.max(), ys.min(), ys.max()
                ann["area"] = float((x1 - x0) * (y1 - y0))
                ann["id"] = aid + 1
                ann["bbox"] = [float(x0), float(y0), float(x1 - x0), float(y1 - y0)]
        res.dataset["annotations"] = anns
        res.dataset["categories"] = copy.deepcopy(self.dataset.get("categories", []))
        res.createIndex()
        return res

    # -- mask helpers --------------------------------------------------------
    def annToRLE(self, ann):
        img = self.imgs[ann["image_id"]]
        h, w = img["height"], img["width"]
        segm = ann["segmentation"]
        return rle_codec.frPyObjects(segm, h, w)

    def annToMask(self, ann):
        return rle_codec.decode(self.annToRLE(ann))
