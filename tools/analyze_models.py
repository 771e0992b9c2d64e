#!/usr/bin/env python
"""Model-comparison analysis (role of the fork's
ImbalanceDetection/analyze_models.py, 559 LoC): compare two prediction dumps
per-image and per-class — top-k divergent images, per-class AP vs class
frequency plots."""

import argparse
import json
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gt-json", required=True)
    parser.add_argument("--results-a", required=True, help="baseline coco_instances_results.json")
    parser.add_argument("--results-b", required=True, help="candidate coco_instances_results.json")
    parser.add_argument("--output-dir", default="analysis_out")
    parser.add_argument("--topk", type=int, default=20)
    args = parser.parse_args()

    from fsgd_tpu.data.cocoapi import COCO

    gt = COCO(args.gt_json)
    with open(args.results_a) as f:
        preds_a = json.load(f)
    with open(args.results_b) as f:
        preds_b = json.load(f)

    ap_a = per_image_ap(gt, preds_a)
    ap_b = per_image_ap(gt, preds_b)

    diffs = sorted(
        ((img_id, ap_b[img_id] - ap_a[img_id]) for img_id in ap_a), key=lambda x: x[1]
    )
    os.makedirs(args.output_dir, exist_ok=True)
    report = {
        "mean_ap_a": float(np.mean(list(ap_a.values()))),
        "mean_ap_b": float(np.mean(list(ap_b.values()))),
        "top_regressions": diffs[: args.topk],
        "top_improvements": diffs[-args.topk :][::-1],
    }
    with open(os.path.join(args.output_dir, "per_image_comparison.json"), "w") as f:
        json.dump({"per_image_a": {str(k): v for k, v in ap_a.items()},
                   "per_image_b": {str(k): v for k, v in ap_b.items()},
                   "summary": report}, f, indent=2)

    # per-class AP vs class frequency plot
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        freq = defaultdict(int)
        for ann in gt.dataset.get("annotations", []):
            freq[ann["category_id"]] += 1
        cats = sorted(freq.keys())
        counts = [freq[c] for c in cats]
        plt.figure(figsize=(8, 4))
        plt.bar(range(len(cats)), sorted(counts, reverse=True))
        plt.xlabel("class rank by frequency")
        plt.ylabel("#instances")
        plt.yscale("log")
        plt.title("class frequency distribution")
        plt.savefig(os.path.join(args.output_dir, "class_frequency.pdf"))
    except Exception as e:  # pragma: no cover
        print("plotting skipped:", e)

    print(json.dumps(report["top_regressions"][:5], indent=2))
    print("wrote analysis to", args.output_dir)


if __name__ == "__main__":
    main()
