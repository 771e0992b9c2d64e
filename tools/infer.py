#!/usr/bin/env python
"""Batch file-list inference -> COCO-json results (role of the fork's
tools/infer.py, 120 LoC): run a trained model over a directory or file list
and dump `coco_instances_results.json`."""

import argparse
import glob
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logger = logging.getLogger("fsgd_tpu.infer")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--input", required=True, help="image file, directory, or glob")
    parser.add_argument("--output", default="inference_out")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from fsgd_tpu.config import get_cfg
    from fsgd_tpu.data.detection_utils import read_image
    from fsgd_tpu.engine import DefaultPredictor
    from fsgd_tpu.evaluation.coco_evaluation import instances_to_coco_json

    from fsgd_tpu.projects import setup_project_cfg

    cfg = get_cfg()
    setup_project_cfg(cfg, args.config_file)
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()

    if os.path.isdir(args.input):
        files = sorted(
            sum((glob.glob(os.path.join(args.input, "*." + ext)) for ext in ("jpg", "jpeg", "png")), [])
        )
    elif any(c in args.input for c in "*?"):
        files = sorted(glob.glob(args.input))
    else:
        files = [args.input]
    assert files, "no input images found"

    predictor = DefaultPredictor(cfg)
    os.makedirs(args.output, exist_ok=True)
    results = []
    for i, path in enumerate(files):
        img = read_image(path, format=cfg.INPUT.FORMAT)
        outputs = predictor(img)
        results.extend(instances_to_coco_json(outputs["instances"], i))
        logger.info("%s: %d detections", path, len(outputs["instances"]))
    out_path = os.path.join(args.output, "coco_instances_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f)
    logger.info("Wrote %d detections to %s", len(results), out_path)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
