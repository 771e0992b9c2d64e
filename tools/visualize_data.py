#!/usr/bin/env python
"""Visualize dataset GT or dataloader output (role of reference
tools/visualize_data.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="")
    parser.add_argument("--source", choices=["annotation", "dataloader"], default="annotation")
    parser.add_argument("--output-dir", default="vis_out")
    parser.add_argument("--show-count", type=int, default=10)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from fsgd_tpu.config import get_cfg
    from fsgd_tpu.data import DatasetCatalog, MetadataCatalog
    from fsgd_tpu.data.detection_utils import read_image
    from fsgd_tpu.utils.visualizer import Visualizer

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)

    os.makedirs(args.output_dir, exist_ok=True)
    name = cfg.DATASETS.TRAIN[0]
    metadata = MetadataCatalog.get(name)
    dicts = DatasetCatalog.get(name)
    for i, dic in enumerate(dicts[: args.show_count]):
        img = read_image(dic["file_name"], "RGB")
        vis = Visualizer(img, metadata=metadata)
        out = vis.draw_dataset_dict(dic)
        out.save(os.path.join(args.output_dir, os.path.basename(dic["file_name"])))
        print("saved", dic["file_name"])


if __name__ == "__main__":
    main()
