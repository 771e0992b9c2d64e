#!/usr/bin/env python
"""Extract semantic-segmentation PNGs from COCO panoptic annotations.

Role of the reference's ``datasets/prepare_panoptic_fpn.py`` (116 LoC): the
"separated" PanopticFPN datasets need a per-pixel semantic PNG where every
*thing* class is 0, *stuff* classes get contiguous ids from 1, and unlabeled
pixels are 255 (reference prepare_panoptic_fpn.py:28-67).

This version has no panopticapi dependency — the RGB→segment-id decoding
(id = R + 256 G + 65536 B) is three lines of numpy — and processes splits
sequentially (the fixture splits are tiny; real val2017 takes ~2 min).

Usage:
    python datasets/prepare_panoptic_fpn.py [--root DATASETS_ROOT]

Processes every ``coco/annotations/panoptic_*.json`` whose PNG directory
exists, writing ``coco/panoptic_stuff_<split>/``.
"""

import argparse
import glob
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rgb2id(color):
    color = color.astype(np.uint32)
    return color[..., 0] + 256 * color[..., 1] + 65536 * color[..., 2]


def separate_semantic_from_panoptic(panoptic_json, panoptic_root, sem_seg_root, categories):
    """Map thing→0, stuff→contiguous ids from 1, unlabeled→255."""
    os.makedirs(sem_seg_root, exist_ok=True)
    stuff_ids = [k["id"] for k in categories if k["isthing"] == 0]
    thing_ids = [k["id"] for k in categories if k["isthing"] == 1]
    assert len(stuff_ids) <= 254
    id_map = {}  # category id -> semantic id
    for i, stuff_id in enumerate(stuff_ids):
        id_map[stuff_id] = i + 1
    for thing_id in thing_ids:
        id_map[thing_id] = 0
    id_map[0] = 255

    with open(panoptic_json) as f:
        obj = json.load(f)
    for anno in obj["annotations"]:
        pan = np.asarray(Image.open(os.path.join(panoptic_root, anno["file_name"])))
        seg_ids = rgb2id(pan)
        out = np.full(seg_ids.shape, 255, np.uint8)
        for seg in anno["segments_info"]:
            out[seg_ids == seg["id"]] = id_map[seg["category_id"]]
        Image.fromarray(out).save(os.path.join(sem_seg_root, anno["file_name"]))
    print("  %s: %d semantic PNGs -> %s"
          % (os.path.basename(panoptic_json), len(obj["annotations"]), sem_seg_root))


def main(root):
    coco = os.path.join(root, "coco")
    jsons = sorted(glob.glob(os.path.join(coco, "annotations", "panoptic_*.json")))
    if not jsons:
        print("no panoptic annotations under %s/annotations — nothing to do" % coco)
        return
    for pj in jsons:
        split = os.path.basename(pj)[len("panoptic_"):-len(".json")]
        panoptic_root = os.path.join(coco, "panoptic_" + split)
        if not os.path.isdir(panoptic_root):
            print("skipping %s (no PNG dir %s)" % (pj, panoptic_root))
            continue
        with open(pj) as f:
            categories = json.load(f)["categories"]
        separate_semantic_from_panoptic(
            pj, panoptic_root, os.path.join(coco, "panoptic_stuff_" + split), categories
        )


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default=os.environ.get("FSGD_DATASETS",
                                                    os.path.dirname(os.path.abspath(__file__))),
                   help="dataset root (default: this datasets/ dir or $FSGD_DATASETS)")
    main(p.parse_args().root)
