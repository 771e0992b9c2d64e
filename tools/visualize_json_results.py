#!/usr/bin/env python
"""Overlay dumped COCO-json results on images (role of reference
tools/visualize_json_results.py)."""

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="coco_instances_results.json")
    parser.add_argument("--output", required=True, help="output directory")
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--conf-threshold", type=float, default=0.5)
    args = parser.parse_args()

    from fsgd_tpu.data import DatasetCatalog, MetadataCatalog
    from fsgd_tpu.data.detection_utils import read_image
    from fsgd_tpu.structures import Boxes, BoxMode, Instances
    from fsgd_tpu.utils.visualizer import Visualizer

    with open(args.input) as f:
        predictions = json.load(f)
    pred_by_image = defaultdict(list)
    for p in predictions:
        pred_by_image[p["image_id"]].append(p)

    metadata = MetadataCatalog.get(args.dataset)
    reverse = None
    if metadata.get("thing_dataset_id_to_contiguous_id") is not None:
        reverse = metadata.thing_dataset_id_to_contiguous_id

    os.makedirs(args.output, exist_ok=True)
    for dic in DatasetCatalog.get(args.dataset):
        preds = [p for p in pred_by_image[dic["image_id"]] if p["score"] >= args.conf_threshold]
        img = read_image(dic["file_name"], "RGB")
        inst = Instances((dic["height"], dic["width"]))
        boxes = np.array([p["bbox"] for p in preds]).reshape(-1, 4)
        inst.pred_boxes = Boxes(BoxMode.convert(boxes, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS))
        inst.scores = np.array([p["score"] for p in preds])
        inst.pred_classes = np.array(
            [reverse.get(p["category_id"], p["category_id"]) if reverse else p["category_id"] for p in preds]
        )
        vis = Visualizer(img, metadata=metadata)
        vis.draw_instance_predictions(inst).save(
            os.path.join(args.output, os.path.basename(dic["file_name"]))
        )
        print("saved", dic["file_name"])


if __name__ == "__main__":
    main()
