#!/usr/bin/env python
"""Convert KITT-style surface-sign splits to COCO-format annotations.

Role of the reference's ``datasets/prepare_surface_signs.py`` (115 LoC): the
fork's ssigns dataset ships as per-session directories with normalized-corner
``bbox.json`` files plus a split file (``[training]/[validation]/[test]``
sections) and a label-definition file (one ``name|alias|...`` line per class,
hierarchical names joined by ``/``).  This script flattens that layout into
one COCO instances JSON per split, which ``register_ssigns_instances``
(fsgd_tpu/data/datasets/surface_signs.py) loads directly.

Usage:
    python datasets/prepare_surface_signs.py \
        [-s uca_split_unweighted.txt] [-l label_def_class_aware_150.txt]

Reads and writes under ``datasets/surface_signs/annotations/``.
"""

import argparse
import json
import os

SPLITS = ("training", "validation", "test")
TILE_W, TILE_H = 800, 1500
IMAGE_SUBPATH = "lri_1refl_height_filtered/image_COMBINED.png"


def read_split(path):
    """Parse a ``[section]``-delimited list of session paths."""
    sections = {s: [] for s in SPLITS}
    current = []
    with open(path) as f:
        for line in (ln.strip() for ln in f):
            if len(line) > 2 and line[0] == "[" and line[-1] == "]":
                current = sections[line[1:-1]]
            elif line and not line.startswith("#"):
                current.append(line)
    return sections


def read_label_def(path):
    """One category per line; ``|``-separated aliases all map to the same id."""
    categories, lookup = [], {}
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    for idx, line in enumerate(lines):
        categories.append({"supercategory": "ssigns", "id": idx + 1,
                           "name": line.replace("/", "_")})
        for alias in line.split("|"):
            if alias.strip():
                lookup[alias.strip()] = idx + 1
    return categories, lookup


def label_id(lookup, name):
    """Resolve hierarchical labels by walking up ``a/b/c → a/b → a``."""
    while name:
        if name in lookup:
            return lookup[name]
        name = "/".join(name.split("/")[:-1])
    return -1


def convert(split_file, label_def_file):
    ann_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "surface_signs", "annotations")
    sections = read_split(os.path.join(ann_dir, split_file))
    categories, lookup = read_label_def(os.path.join(ann_dir, label_def_file))
    suffix = label_def_file[len("label_def_"):].split(".")[0] \
        if label_def_file.startswith("label_def_") else label_def_file.split(".")[0]
    split_name = split_file.split(".")[0]

    img_id = box_id = 0
    for split, sessions in sections.items():
        images, annotations = [], []
        for session in sessions:
            images.append({"license": 0, "coco_url": "", "data_captured": "",
                           "file_name": os.path.join(session, IMAGE_SUBPATH),
                           "width": TILE_W, "height": TILE_H, "id": img_id})
            with open(os.path.join(session, "bbox.json")) as f:
                boxes = json.load(f)
            for b in boxes:
                # normalized [xmin, ymin, xmax, ymax] corners → absolute XYWH
                x1, y1, x2, y2 = b["bbox"]
                coco_box = [x1 * TILE_W, y1 * TILE_H,
                            (x2 - x1) * TILE_W, (y2 - y1) * TILE_H]
                cid = label_id(lookup, b.get("label", ""))
                if cid > 0:
                    annotations.append({"segmentation": [], "iscrowd": 0,
                                        "area": coco_box[2] * coco_box[3],
                                        "image_id": img_id, "bbox": coco_box,
                                        "category_id": cid - 1, "id": box_id})
                    box_id += 1
            img_id += 1
        out = os.path.join(ann_dir, "%s_%s_%s.json" % (suffix, split_name, split))
        with open(out, "w") as f:
            json.dump({"images": images, "annotations": annotations,
                       "categories": categories}, f, indent=2)
        print("  %s: %d images, %d boxes" % (out, len(images), len(annotations)))


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-s", "--split_file", default="uca_split_unweighted.txt")
    p.add_argument("-l", "--label_def_file", default="label_def_class_aware_150.txt")
    a = p.parse_args()
    convert(a.split_file, a.label_def_file)
