"""Extended analyze_models suite (reference ImbalanceDetection/analyze_models.py)."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from analyze_models import (
    _class_orderings,
    get_topk_different_imgs,
    per_class_ap,
    per_image_ap,
    plot_aps,
)


def _gt(tmp_path):
    images = [{"id": i, "height": 100, "width": 100, "file_name": f"{i}.jpg"} for i in (1, 2)]
    anns = []
    aid = 1
    for img_id in (1, 2):
        for c, nbox in ((1, 3), (2, 1)):
            for b in range(nbox):
                anns.append({
                    "id": aid, "image_id": img_id, "category_id": c,
                    "bbox": [10.0 * b, 10.0, 20.0, 30.0], "area": 600.0, "iscrowd": 0,
                })
                aid += 1
    data = {"images": images, "annotations": anns,
            "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]}
    p = str(tmp_path / "gt.json")
    json.dump(data, open(p, "w"))
    return p, data


def _preds_from_gt(data, score=0.9):
    return [
        {"image_id": a["image_id"], "category_id": a["category_id"],
         "bbox": a["bbox"], "score": score}
        for a in data["annotations"]
    ]


def test_per_class_and_per_image_ap(tmp_path):
    from fsgd_tpu.data.cocoapi import COCO

    path, data = _gt(tmp_path)
    gt = COCO(path)
    preds = _preds_from_gt(data)
    cls = per_class_ap(gt, preds)
    assert cls[1] > 99 and cls[2] > 99  # perfect predictions
    imap = per_image_ap(gt, preds)
    assert all(v > 0.99 for v in imap.values())
    # drop class 2 -> its AP collapses, class 1 stays
    cls_partial = per_class_ap(gt, [p for p in preds if p["category_id"] == 1])
    assert cls_partial[1] > 99
    assert np.isnan(cls_partial[2]) or cls_partial[2] == 0.0


def test_topk_and_orderings(tmp_path):
    from fsgd_tpu.data.cocoapi import COCO

    path, data = _gt(tmp_path)
    gt = COCO(path)
    top = get_topk_different_imgs({1: 0.9, 2: 0.2}, {1: 0.5, 2: 0.5}, 1, "desc")
    assert list(top) == [1]
    orderings = _class_orderings(gt, {1: 50.0, 2: 20.0})
    assert set(orderings) == {"frequency", "size", "ap", "class_entropy", "none"}
    assert orderings["frequency"][0] == 1  # class 1 has 3x the instances
    assert orderings["ap"][0] == 1


def test_plot_aps_writes_pngs(tmp_path):
    from fsgd_tpu.data.cocoapi import COCO

    path, data = _gt(tmp_path)
    gt = COCO(path)
    out = str(tmp_path / "plots")
    os.makedirs(out)
    plot_aps(gt, {1: 40.0, 2: 30.0}, {1: 35.0, 2: 33.0}, out)
    files = os.listdir(out)
    assert "byfrequency_ap_compare.png" in files
    assert "byap_ap_diffs.png" in files
    assert len([f for f in files if f.endswith(".png")]) == 10
