#!/usr/bin/env python
"""Query DB — print / visualize DensePose dataset entries.

Parity target: projects/DensePose/query_db.py:36-247 + the EntrySelector DSL
of densepose/utils/dbhelper.py:5-145:

  python tools/query_db.py print <dataset> <selector> [--max-entries N]
  python tools/query_db.py show  <dataset> <selector> dp_segm,dp_pts,bbox \\
      [--output output.png]

Selector grammar: ``*`` accepts everything; otherwise comma-separated
``field[:type]=value`` or ``field[:type]=min-max`` range constraints, e.g.
``image_id:int=18-100``.
"""

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logger = logging.getLogger("query_db")


class EntrySelector:
    """dbhelper.py:5-145 — '*' or field[:type]=value / =min-max constraints."""

    @staticmethod
    def from_string(spec: str) -> "EntrySelector":
        if spec == "*":
            return EntrySelector()
        return FieldEntrySelector(spec)

    def __call__(self, entry) -> bool:
        return True


class FieldEntrySelector(EntrySelector):
    _TYPES = {"int": int, "str": str}

    def __init__(self, spec: str):
        self._predicates = []
        for constraint in spec.split(","):
            field_spec, value = constraint.split("=", 1)
            if ":" in field_spec:
                name, type_name = field_spec.split(":", 1)
                typ = self._TYPES[type_name]
            else:
                name, typ = field_spec, str
            if "-" in value and typ is int:
                lo, hi = value.split("-", 1)
                self._predicates.append(
                    lambda e, n=name, lo=int(lo), hi=int(hi): n in e and lo <= int(e[n]) <= hi
                )
            else:
                self._predicates.append(
                    lambda e, n=name, t=typ, v=value: n in e and e[n] == t(v)
                )

    def __call__(self, entry) -> bool:
        return all(p(entry) for p in self._predicates)


def setup_dataset(dataset_name):
    from fsgd_tpu.data.catalog import DatasetCatalog
    from fsgd_tpu.projects.densepose import register_densepose_datasets

    register_densepose_datasets()
    logger.info("Loading dataset %s", dataset_name)
    return DatasetCatalog.get(dataset_name)


def _iter_selected(args):
    dataset = setup_dataset(args.dataset)
    selector = EntrySelector.from_string(args.selector)
    count = 0
    for entry in dataset:
        if not selector(entry):
            continue
        yield entry
        count += 1
        if args.max_entries is not None and count >= args.max_entries:
            return


def command_print(args):
    """Reference query_db.py PrintAction:94-118."""
    import pprint

    printer = pprint.PrettyPrinter(indent=2, width=200, compact=True)
    for entry in _iter_selected(args):
        printer.pprint(entry)


def command_show(args):
    """Reference query_db.py ShowAction:120-247."""
    import cv2

    from fsgd_tpu.projects.densepose.structures import DensePoseDataRelative
    from fsgd_tpu.projects.densepose.vis import (
        BoundingBoxVisualizer,
        DensePoseDataCoarseSegmentationVisualizer,
        DensePoseDataPointsIVisualizer,
        DensePoseDataPointsUVisualizer,
        DensePoseDataPointsVisualizer,
        DensePoseDataPointsVVisualizer,
    )
    from fsgd_tpu.structures import BoxMode

    catalog = {
        "dp_segm": DensePoseDataCoarseSegmentationVisualizer(),
        "dp_i": DensePoseDataPointsIVisualizer(),
        "dp_u": DensePoseDataPointsUVisualizer(),
        "dp_v": DensePoseDataPointsVVisualizer(),
        "dp_pts": DensePoseDataPointsVisualizer(),
        "bbox": BoundingBoxVisualizer(),
    }
    vis_specs = args.visualizations.split(",")
    visualizers = [catalog[s] for s in vis_specs]

    def extract(entry):
        boxes, dp_datas = [], []
        for ann in entry.get("annotations", []):
            is_valid, _ = DensePoseDataRelative.validate_annotation(ann)
            if not is_valid:
                continue
            boxes.append(BoxMode.convert(ann["bbox"], ann["bbox_mode"], BoxMode.XYWH_ABS))
            dp_datas.append(DensePoseDataRelative(ann))
        all_boxes = [
            BoxMode.convert(a["bbox"], a["bbox_mode"], BoxMode.XYWH_ABS)
            for a in entry.get("annotations", [])
        ]
        datas = []
        for spec in vis_specs:
            datas.append(all_boxes if spec == "bbox" else (boxes, dp_datas))
        return datas

    entry_idx = 1
    for entry in _iter_selected(args):
        image = cv2.imread(entry["file_name"], cv2.IMREAD_GRAYSCALE)
        if image is None:
            logger.warning("Could not read %s", entry["file_name"])
            continue
        image = np.tile(image[:, :, None], [1, 1, 3])
        for vis, data in zip(visualizers, extract(entry)):
            image = vis.visualize(image, data)
        base, ext = os.path.splitext(args.output)
        out_fname = base + ".{0:04d}".format(entry_idx) + ext
        out_dir = os.path.dirname(out_fname)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        cv2.imwrite(out_fname, image)
        logger.info("Output saved to %s", out_fname)
        entry_idx += 1


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p_print = sub.add_parser("print", help="Output selected entries to stdout.")
    p_print.add_argument("dataset", metavar="<dataset>")
    p_print.add_argument("selector", metavar="<selector>")
    p_print.add_argument("--max-entries", type=int, default=None)
    p_print.set_defaults(func=command_print)

    p_show = sub.add_parser("show", help="Visualize selected entries")
    p_show.add_argument("dataset", metavar="<dataset>")
    p_show.add_argument("selector", metavar="<selector>")
    p_show.add_argument("visualizations", metavar="<visualizations>")
    p_show.add_argument("--max-entries", type=int, default=None)
    p_show.add_argument("--output", default="output.png")
    p_show.set_defaults(func=command_show)

    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    args.func(args)


if __name__ == "__main__":
    main()
