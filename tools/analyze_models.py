#!/usr/bin/env python
"""Model-comparison analysis suite.

Parity target: ImbalanceDetection/analyze_models.py (559 LoC) — compare two
prediction dumps (the gambler-trained model vs its baseline):

- per-image bbox AP for every image; top-k divergent images
  (``get_topk_different_imgs``, reference :57-71)
- per-class AP bar plots, ours vs baseline overlaid and their difference,
  sorted by class frequency / mean object size / baseline AP / class
  entropy (instances per containing image) (``plot_aps``, reference :74-173)
- optional side-by-side visual dumps of the top-k divergent images with
  both models' predictions drawn (reference :188-420), when --image-root
  is given.

Inputs are the framework's standard artifacts: the GT json and two
``coco_instances_results.json`` dumps.
"""

import argparse
import json
import math
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def per_image_ap(coco_gt, predictions):
    """Single-image bbox AP for every image (Analyzer-style dump)."""
    from fsgd_tpu.evaluation.cocoeval import COCOeval

    out = {}
    by_img = defaultdict(list)
    for p in predictions:
        by_img[p["image_id"]].append(p)
    for img_id in coco_gt.getImgIds():
        preds = by_img.get(img_id, [])
        if not preds:
            out[img_id] = 0.0
            continue
        dt = coco_gt.loadRes(preds)
        ev = COCOeval(coco_gt, dt, "bbox")
        ev.params.imgIds = [img_id]
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        out[img_id] = float(ev.stats[0])
    return out


def per_class_ap(coco_gt, predictions):
    """Per-category bbox AP from the accumulated precision tensor
    (what the reference reads out of COCOEvaluator's AP-<name> keys)."""
    from fsgd_tpu.evaluation.cocoeval import COCOeval

    cat_ids = coco_gt.getCatIds()
    if not predictions:
        return {c: float("nan") for c in cat_ids}
    dt = coco_gt.loadRes(predictions)
    ev = COCOeval(coco_gt, dt, "bbox")
    ev.evaluate()
    ev.accumulate()
    precision = ev.eval["precision"]  # (T, R, K, A, M)
    out = {}
    for k, cat_id in enumerate(ev.params.catIds):
        p = precision[:, :, k, 0, -1]
        p = p[p > -1]
        out[cat_id] = float(np.mean(p)) * 100 if p.size else float("nan")
    return out


def get_topk_different_imgs(imgid_to_ap_ours, imgid_to_ap_base, k, order="desc"):
    """Reference analyze_models.py:57-71."""
    diffs = {i: imgid_to_ap_ours[i] - imgid_to_ap_base[i] for i in imgid_to_ap_ours}
    items = sorted(diffs.items(), key=lambda kv: kv[1], reverse=(order == "desc"))
    return dict(items[:k])


def _class_orderings(coco_gt, base_ap):
    """The four sort keys of reference plot_aps :92-157, from the GT json."""
    cat_ids = sorted(coco_gt.getCatIds())
    freq = {c: 0 for c in cat_ids}
    areas = {c: [] for c in cat_ids}
    rel_areas = {c: [] for c in cat_ids}
    imgs_per_cat = {c: set() for c in cat_ids}
    img_hw = {im["id"]: (im["height"], im["width"]) for im in coco_gt.dataset["images"]}
    for ann in coco_gt.dataset.get("annotations", []):
        c = ann["category_id"]
        if c not in freq:
            continue
        freq[c] += 1
        a = ann["bbox"][2] * ann["bbox"][3]
        h, w = img_hw[ann["image_id"]]
        areas[c].append(a)
        rel_areas[c].append(a / max(h * w, 1))
        imgs_per_cat[c].add(ann["image_id"])
    entropy = {
        c: (freq[c] / max(len(imgs_per_cat[c]), 1)) for c in cat_ids
    }  # instances per containing image (reference "class_entropy" :139-154)
    mean_rel_area = {c: (float(np.mean(rel_areas[c])) if rel_areas[c] else 0.0) for c in cat_ids}

    def order_by(d, reverse=True):
        return [c for c, _ in sorted(d.items(), key=lambda kv: (
            float("-inf") if isinstance(kv[1], float) and math.isnan(kv[1]) else kv[1]
        ), reverse=reverse)]

    return {
        "frequency": order_by(freq),
        "size": order_by(mean_rel_area),
        "ap": order_by(base_ap),
        "class_entropy": order_by(entropy),
        "none": cat_ids,
    }


def plot_aps(coco_gt, ours_ap, base_ap, output_dir, tag_ours="ours", tag_base="baseline"):
    """Per-class AP bars (ours up / baseline down) + diff plot per sort key
    (reference plot_aps :74-173)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = {c["id"]: c.get("name", str(c["id"])) for c in coco_gt.dataset.get("categories", [])}
    orderings = _class_orderings(coco_gt, base_ap)
    for sort, order in orderings.items():
        labels = [names.get(c, str(c)) for c in order]
        ours = np.array([ours_ap.get(c, np.nan) for c in order])
        base = np.array([base_ap.get(c, np.nan) for c in order])
        x = np.arange(len(order))

        fig = plt.figure(figsize=(max(10, len(order) * 0.35), 8))
        plt.bar(x, np.nan_to_num(ours), width=0.5, color="#3DA4AB", label=tag_ours)
        plt.bar(x, -np.nan_to_num(base), width=0.5, color="red", label=tag_base)
        plt.xticks(x, labels, rotation=90, fontsize=8)
        plt.ylabel("AP (baseline mirrored)")
        plt.legend()
        plt.title("per-class AP sorted by {}".format(sort))
        fig.tight_layout()
        fig.savefig(os.path.join(output_dir, "by{}_ap_compare.png".format(sort)))
        plt.close(fig)

        fig = plt.figure(figsize=(max(10, len(order) * 0.35), 8))
        plt.bar(x, np.nan_to_num(ours - base), width=0.5, color="green")
        plt.xticks(x, labels, rotation=90, fontsize=8)
        plt.ylabel("AP diff (ours - baseline)")
        plt.title("per-class AP difference sorted by {}".format(sort))
        fig.tight_layout()
        fig.savefig(os.path.join(output_dir, "by{}_ap_diffs.png".format(sort)))
        plt.close(fig)


def visualize_topk(coco_gt, preds_a, preds_b, top_imgs, image_root, output_dir, conf_threshold=0.5):
    """Side-by-side prediction drawings for divergent images (reference :188-420)."""
    import cv2

    from fsgd_tpu.structures import Boxes, BoxMode, Instances
    from fsgd_tpu.utils.visualizer import Visualizer

    by_img_a = defaultdict(list)
    by_img_b = defaultdict(list)
    for p in preds_a:
        by_img_a[p["image_id"]].append(p)
    for p in preds_b:
        by_img_b[p["image_id"]].append(p)
    imgs = {im["id"]: im for im in coco_gt.dataset["images"]}

    def draw(img, preds, hw):
        inst = Instances(hw)
        kept = [p for p in preds if p["score"] > conf_threshold]
        if kept:
            inst.scores = np.array([p["score"] for p in kept])
            inst.pred_boxes = Boxes(
                BoxMode.convert(np.array([p["bbox"] for p in kept]), BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
            )
            inst.pred_classes = np.array([p["category_id"] - 1 for p in kept])
        return Visualizer(img).draw_instance_predictions(inst).get_image()

    os.makedirs(output_dir, exist_ok=True)
    for img_id in top_imgs:
        info = imgs.get(img_id)
        if info is None:
            continue
        path = os.path.join(image_root, info.get("file_name", ""))
        if not os.path.isfile(path):
            continue
        img = cv2.imread(path)[:, :, ::-1]
        hw = img.shape[:2]
        va = draw(img, by_img_a.get(img_id, []), hw)
        vb = draw(img, by_img_b.get(img_id, []), hw)
        side = np.concatenate([va, vb], axis=1)
        cv2.imwrite(os.path.join(output_dir, "img_{}.png".format(img_id)), side[:, :, ::-1])


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--gt-json", required=True)
    parser.add_argument("--results-a", required=True, help="baseline coco_instances_results.json")
    parser.add_argument("--results-b", required=True, help="candidate coco_instances_results.json")
    parser.add_argument("--output-dir", default="analysis_out")
    parser.add_argument("--topk", type=int, default=20)
    parser.add_argument("--image-root", default=None, help="draw top-k divergent images when set")
    parser.add_argument("--conf-threshold", type=float, default=0.5)
    args = parser.parse_args()

    from fsgd_tpu.data.cocoapi import COCO

    gt = COCO(args.gt_json)
    with open(args.results_a) as f:
        preds_a = json.load(f)
    with open(args.results_b) as f:
        preds_b = json.load(f)

    os.makedirs(args.output_dir, exist_ok=True)

    ap_a = per_image_ap(gt, preds_a)
    ap_b = per_image_ap(gt, preds_b)
    improvements = get_topk_different_imgs(ap_b, ap_a, args.topk, "desc")
    regressions = get_topk_different_imgs(ap_b, ap_a, args.topk, "asc")
    report = {
        "mean_ap_a": float(np.mean(list(ap_a.values()))),
        "mean_ap_b": float(np.mean(list(ap_b.values()))),
        "top_regressions": [[int(k), v] for k, v in regressions.items()],
        "top_improvements": [[int(k), v] for k, v in improvements.items()],
    }
    with open(os.path.join(args.output_dir, "per_image_comparison.json"), "w") as f:
        json.dump({"per_image_a": {str(k): v for k, v in ap_a.items()},
                   "per_image_b": {str(k): v for k, v in ap_b.items()},
                   "summary": report}, f, indent=2)

    cls_a = per_class_ap(gt, preds_a)
    cls_b = per_class_ap(gt, preds_b)
    with open(os.path.join(args.output_dir, "per_class_ap.json"), "w") as f:
        json.dump({"baseline": {str(k): v for k, v in cls_a.items()},
                   "ours": {str(k): v for k, v in cls_b.items()}}, f, indent=2)
    try:
        plot_aps(gt, cls_b, cls_a, args.output_dir)
    except Exception as e:  # pragma: no cover
        print("plotting skipped:", e)

    if args.image_root:
        both = list(improvements) + list(regressions)
        visualize_topk(gt, preds_a, preds_b, both, args.image_root,
                       os.path.join(args.output_dir, "topk_images"), args.conf_threshold)

    print(json.dumps(report["top_regressions"][:5], indent=2))
    print("wrote analysis to", args.output_dir)


if __name__ == "__main__":
    main()
