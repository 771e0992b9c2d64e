#!/usr/bin/env python
"""Batch file-list inference -> COCO-json results (role of the fork's
tools/infer.py, 120 LoC): run a trained model over a directory, glob, or
image-list file and dump `coco_instances_results.json`; optionally plot the
predictions (reference --plot_output)."""

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
    parser.add_argument("--input", default=None, help="image file, directory, or glob")
    parser.add_argument(
        "--input_file", default=None, help="a file with a list of input image paths"
    )
    parser.add_argument("--output", default="inference_out")
    parser.add_argument(
        "--confidence_threshold",
        type=float,
        default=0.5,
        help="minimum score for instance predictions to be shown",
    )
    parser.add_argument(
        "--plot_output", action="store_true", help="also save prediction overlays"
    )
    # Both spellings of the overrides tail are accepted: the fork's
    # `--opts KEY VALUE ...` and this repo's bare trailing `KEY VALUE ...`.
    parser.add_argument("--opts", dest="opts_flag", default=[], nargs=argparse.REMAINDER)
    parser.add_argument("opts", default=[], nargs=argparse.REMAINDER)
    args = parser.parse_args()
    opts = list(args.opts_flag or []) + list(args.opts or [])
    assert args.input or args.input_file, "need --input or --input_file"

    from fsgd_tpu.config import get_cfg
    from fsgd_tpu.data.detection_utils import read_image
    from fsgd_tpu.engine import DefaultPredictor
    from fsgd_tpu.evaluation.coco_evaluation import instances_to_coco_json

    from fsgd_tpu.projects import setup_project_cfg

    cfg = get_cfg()
    setup_project_cfg(cfg, args.config_file)
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(opts)
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = args.confidence_threshold
    cfg.MODEL.RETINANET.SCORE_THRESH_TEST = args.confidence_threshold
    cfg.freeze()

    if args.input_file:
        with open(args.input_file) as f:
            files = [line.strip() for line in f if line.strip()]
    elif os.path.isdir(args.input):
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
        if args.plot_output:
            from fsgd_tpu.utils.visualizer import Visualizer

            rgb = img[:, :, ::-1] if cfg.INPUT.FORMAT == "BGR" else img
            vis = Visualizer(rgb).draw_instance_predictions(outputs["instances"])
            vis.save(os.path.join(args.output, os.path.basename(path) + ".pred.png"))
    out_path = os.path.join(args.output, "coco_instances_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f)
    logger.info("Wrote %d detections to %s", len(results), out_path)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
