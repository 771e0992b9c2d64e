#!/usr/bin/env python
"""Interactive demo CLI (role of reference demo/demo.py): run a model over
images / a video / a webcam and write or display visualizations."""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2

from predictor import VisualizationDemo

from fsgd_tpu.config import get_cfg
from fsgd_tpu.utils.logger import setup_logger


def setup_cfg(args):
    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.MODEL.RETINANET.SCORE_THRESH_TEST = args.confidence_threshold
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = args.confidence_threshold
    cfg.freeze()
    return cfg


def get_parser():
    parser = argparse.ArgumentParser(description="fsgd_tpu demo")
    parser.add_argument("--config-file", metavar="FILE", required=True)
    parser.add_argument("--input", nargs="+", help="image file(s) or glob")
    parser.add_argument("--video-input", help="video file path")
    parser.add_argument("--output", help="output directory or file")
    parser.add_argument("--confidence-threshold", type=float, default=0.5)
    parser.add_argument("--parallel", action="store_true")
    parser.add_argument("opts", default=[], nargs=argparse.REMAINDER)
    return parser


def main():
    args = get_parser().parse_args()
    logger = setup_logger()
    logger.info("Arguments: " + str(args))
    cfg = setup_cfg(args)
    demo = VisualizationDemo(cfg, parallel=args.parallel)

    if args.input:
        inputs = args.input
        if len(inputs) == 1 and ("*" in inputs[0] or os.path.isdir(inputs[0])):
            pattern = os.path.join(inputs[0], "*") if os.path.isdir(inputs[0]) else inputs[0]
            inputs = sorted(glob.glob(pattern))
        for path in inputs:
            img = cv2.imread(path)
            start = time.time()
            predictions, vis = demo.run_on_image(img)
            n = len(predictions["instances"]) if "instances" in predictions else 0
            logger.info("%s: %d instances in %.2fs", path, n, time.time() - start)
            if args.output:
                os.makedirs(args.output, exist_ok=True)
                vis.save(os.path.join(args.output, os.path.basename(path)))
    elif args.video_input:
        video = cv2.VideoCapture(args.video_input)
        frames = iter(lambda: video.read()[1], None)
        os.makedirs(os.path.dirname(os.path.abspath(args.output or "demo_out.mp4")), exist_ok=True)
        writer = None
        for vis_frame in demo.run_on_video(frames):
            if writer is None and args.output:
                h, w = vis_frame.shape[:2]
                writer = cv2.VideoWriter(
                    args.output, cv2.VideoWriter_fourcc(*"mp4v"), video.get(cv2.CAP_PROP_FPS) or 24, (w, h)
                )
            if writer:
                writer.write(vis_frame[:, :, ::-1])
        if writer:
            writer.release()


if __name__ == "__main__":
    main()
