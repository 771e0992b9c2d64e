#!/usr/bin/env python
"""Apply Net — print / visualize DensePose results.

Parity target: projects/DensePose/apply_net.py:39-309 — ``dump`` pickles
per-image DensePose results, ``show`` renders a comma-separated list of
visualizations (dp_contour, dp_segm, dp_u, dp_v, bbox) onto the inputs.

Usage:
  python tools/apply_net.py dump  <config.yaml> <model> <input> [--output results.pkl]
  python tools/apply_net.py show  <config.yaml> <model> <input> dp_segm,bbox \\
      [--min_score 0.8] [--output outputres.png]
"""

import argparse
import glob
import logging
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logger = logging.getLogger("apply_net")


def setup_config(config_fpath, model_fpath, opts):
    from fsgd_tpu.config import get_cfg
    from fsgd_tpu.projects.densepose import add_densepose_config

    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.merge_from_file(config_fpath)
    if opts:
        cfg.merge_from_list(opts)
    if model_fpath:
        cfg.MODEL.WEIGHTS = model_fpath
    cfg.freeze()
    return cfg


def get_input_file_list(input_spec):
    if os.path.isdir(input_spec):
        return sorted(
            os.path.join(input_spec, f)
            for f in os.listdir(input_spec)
            if os.path.isfile(os.path.join(input_spec, f))
        )
    if os.path.isfile(input_spec):
        return [input_spec]
    return sorted(glob.glob(input_spec))


def run_inference(args, on_outputs, postexecute, context):
    from fsgd_tpu.data.detection_utils import read_image
    from fsgd_tpu.engine import DefaultPredictor

    cfg = setup_config(args.cfg, args.model, args.opts)
    predictor = DefaultPredictor(cfg)
    files = get_input_file_list(args.input)
    if not files:
        logger.warning("No input images for %s", args.input)
        return
    for fname in files:
        img = read_image(fname, format="BGR")
        outputs = predictor(img)["instances"]
        on_outputs(context, {"file_name": fname, "image": img}, outputs)
    postexecute(context)


def command_dump(args):
    """Reference apply_net.py DumpAction:115-170."""
    from fsgd_tpu.projects.densepose.vis import DensePoseResultExtractor

    extractor = DensePoseResultExtractor()

    def on_outputs(context, entry, outputs):
        logger.info("Processing %s", entry["file_name"])
        result = {"file_name": entry["file_name"]}
        if outputs.has("scores"):
            result["scores"] = np.asarray(outputs.scores)
        if outputs.has("pred_boxes"):
            result["pred_boxes_XYXY"] = np.asarray(outputs.pred_boxes.tensor)
            if outputs.has("pred_densepose"):
                result["pred_densepose"] = extractor(outputs)
        context["results"].append(result)

    def postexecute(context):
        out = context["out_fname"]
        out_dir = os.path.dirname(out)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        with open(out, "wb") as f:
            pickle.dump(context["results"], f)
        logger.info("Output saved to %s", out)

    run_inference(args, on_outputs, postexecute, {"results": [], "out_fname": args.output})


def command_show(args):
    """Reference apply_net.py ShowAction:172-309."""
    import cv2

    from fsgd_tpu.projects.densepose.vis import (
        CompoundVisualizer,
        DensePoseResultsContourVisualizer,
        DensePoseResultsFineSegmentationVisualizer,
        DensePoseResultsUVisualizer,
        DensePoseResultsVVisualizer,
        ScoredBoundingBoxVisualizer,
        create_extractor,
    )

    catalog = {
        "dp_contour": DensePoseResultsContourVisualizer,
        "dp_segm": DensePoseResultsFineSegmentationVisualizer,
        "dp_u": DensePoseResultsUVisualizer,
        "dp_v": DensePoseResultsVVisualizer,
        "bbox": ScoredBoundingBoxVisualizer,
    }
    vis_specs = args.visualizations.split(",")
    visualizer = CompoundVisualizer([catalog[spec]() for spec in vis_specs])
    extractor = create_extractor(visualizer)
    args.opts.extend(["MODEL.ROI_HEADS.SCORE_THRESH_TEST", str(args.min_score)])

    def on_outputs(context, entry, outputs):
        logger.info("Processing %s", entry["file_name"])
        image = cv2.cvtColor(entry["image"], cv2.COLOR_BGR2GRAY)
        image = np.tile(image[:, :, None], [1, 1, 3])
        data = extractor(outputs)
        image_vis = visualizer.visualize(image, data)
        entry_idx = context["entry_idx"] + 1
        out_fname = _out_fname(entry_idx, context["out_fname"])
        out_dir = os.path.dirname(out_fname)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        cv2.imwrite(out_fname, image_vis)
        logger.info("Output saved to %s", out_fname)
        context["entry_idx"] = entry_idx

    def _out_fname(entry_idx, fname_base):
        base, ext = os.path.splitext(fname_base)
        return base + ".{0:04d}".format(entry_idx) + ext

    run_inference(args, on_outputs, lambda ctx: None, {"out_fname": args.output, "entry_idx": 0})


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p_dump = sub.add_parser("dump", help="Dump model outputs to a file.")
    p_dump.add_argument("cfg", metavar="<config>")
    p_dump.add_argument("model", metavar="<model>")
    p_dump.add_argument("input", metavar="<input>")
    p_dump.add_argument("--output", default="results.pkl")
    p_dump.add_argument("opts", default=[], nargs="*")
    p_dump.set_defaults(func=command_dump)

    p_show = sub.add_parser("show", help="Visualize selected entries")
    p_show.add_argument("cfg", metavar="<config>")
    p_show.add_argument("model", metavar="<model>")
    p_show.add_argument("input", metavar="<input>")
    p_show.add_argument("visualizations", metavar="<visualizations>")
    p_show.add_argument("--min_score", default=0.8, type=float)
    p_show.add_argument("--output", default="outputres.png")
    p_show.add_argument("opts", default=[], nargs="*")
    p_show.set_defaults(func=command_show)

    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    args.func(args)


if __name__ == "__main__":
    main()
