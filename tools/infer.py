#!/usr/bin/env python
"""Batch file-list inference -> COCO-json results (role of the fork's
tools/infer.py, reference tools/infer.py:20-111): run a trained model over a
directory, glob, or list file and dump COCO-format detections; optionally plot
the predictions (reference --plot_output).

Parity notes vs the reference fork:
 - ``--input_file`` lines that name a *directory* are treated as session dirs
   and expanded fork-style to ``<session>/lri_1refl/image_COMBINED.png``, with
   one ``result.json`` (+ ``predicted.png``) written per session under
   ``--output/<session-name>/`` (reference tools/infer.py:84-111).  Lines that
   name an image file directly are run as-is and aggregated into one
   ``coco_instances_results.json`` (repo extension).
 - ``--confidence_threshold`` only overrides the config score thresholds when
   explicitly passed (so ``--opts MODEL.RETINANET.SCORE_THRESH_TEST ...`` and
   config values win by default); when passed it also sets the panoptic
   combine threshold, as the reference does (reference tools/infer.py:26-28).
"""

import argparse
import glob
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logger = logging.getLogger("fsgd_tpu.infer")

# Fork session-dir layout (reference tools/infer.py:86).
_SESSION_IMAGE = os.path.join("lri_1refl", "image_COMBINED.png")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--input", default=None, help="image file, directory, or glob")
    parser.add_argument(
        "--input_file",
        default=None,
        help="a file listing input image paths or fork-style session directories",
    )
    parser.add_argument("--output", default="inference_out")
    parser.add_argument(
        "--confidence_threshold",
        type=float,
        default=None,
        help="minimum score for instance predictions to be shown "
        "(default: keep the config's score thresholds)",
    )
    parser.add_argument(
        "--plot_output", action="store_true", help="also save prediction overlays"
    )
    parser.add_argument(
        "--opts",
        help="Modify config options using the command-line 'KEY VALUE' pairs "
        "(place last; everything after --opts is consumed)",
        default=[],
        nargs=argparse.REMAINDER,
    )
    args = parser.parse_args()
    assert args.input or args.input_file, "need --input or --input_file"

    from fsgd_tpu.config import get_cfg
    from fsgd_tpu.data.detection_utils import read_image
    from fsgd_tpu.engine import DefaultPredictor
    from fsgd_tpu.evaluation.coco_evaluation import instances_to_coco_json

    from fsgd_tpu.projects import setup_project_cfg

    cfg = get_cfg()
    setup_project_cfg(cfg, args.config_file)
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(list(args.opts or []))
    if args.confidence_threshold is not None:
        cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = args.confidence_threshold
        cfg.MODEL.RETINANET.SCORE_THRESH_TEST = args.confidence_threshold
        cfg.MODEL.PANOPTIC_FPN.COMBINE.INSTANCES_CONFIDENCE_THRESH = (
            args.confidence_threshold
        )
    cfg.freeze()

    # (path, session_name-or-None): session entries get per-session output.
    entries = []
    if args.input_file:
        with open(args.input_file) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                expanded = os.path.join(line, _SESSION_IMAGE)
                if os.path.isdir(line) or os.path.isfile(expanded):
                    entries.append((expanded, os.path.basename(os.path.normpath(line))))
                else:
                    entries.append((line, None))
    elif os.path.isdir(args.input):
        files = sorted(
            sum((glob.glob(os.path.join(args.input, "*." + ext)) for ext in ("jpg", "jpeg", "png")), [])
        )
        entries = [(p, None) for p in files]
    elif any(c in args.input for c in "*?"):
        entries = [(p, None) for p in sorted(glob.glob(args.input))]
    else:
        entries = [(args.input, None)]
    assert entries, "no input images found"

    predictor = DefaultPredictor(cfg)
    os.makedirs(args.output, exist_ok=True)
    aggregated = []
    for i, (path, session) in enumerate(entries):
        img = read_image(path, format=cfg.INPUT.FORMAT)
        outputs = predictor(img)
        logger.info("%s: %d detections", path, len(outputs["instances"]))
        rgb = img[:, :, ::-1] if cfg.INPUT.FORMAT == "BGR" else img
        if session is not None:
            # Fork layout: one result.json per session (reference
            # tools/infer.py:101-106; image_id -1 matches the fork).
            out_dir = os.path.join(args.output, session)
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "result.json"), "w") as f:
                json.dump(instances_to_coco_json(outputs["instances"], -1), f)
            if args.plot_output:
                from fsgd_tpu.utils.visualizer import Visualizer

                vis = Visualizer(rgb).draw_instance_predictions(outputs["instances"])
                vis.save(os.path.join(out_dir, "predicted.png"))
        else:
            aggregated.extend(instances_to_coco_json(outputs["instances"], i))
            if args.plot_output:
                from fsgd_tpu.utils.visualizer import Visualizer

                vis = Visualizer(rgb).draw_instance_predictions(outputs["instances"])
                vis.save(os.path.join(args.output, os.path.basename(path) + ".pred.png"))
    if any(s is None for _, s in entries):
        out_path = os.path.join(args.output, "coco_instances_results.json")
        with open(out_path, "w") as f:
            json.dump(aggregated, f)
        logger.info("Wrote %d detections to %s", len(aggregated), out_path)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
