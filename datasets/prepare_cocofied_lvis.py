#!/usr/bin/env python
"""Rewrite an LVIS annotation file onto the 80 COCO categories ("cocofied").

LVIS v0.5 re-annotated COCO images with higher-quality masks across 1230
classes; to evaluate a COCO-trained model against those masks, keep only the
annotations whose LVIS category is synonymous with one of the 80 COCO thing
classes and remap its ``category_id`` to the COCO id.  (VERDICT round-2
item 5; the public detectron2 lineage ships the same tool as
``datasets/prepare_cocofied_lvis.py``.)

Usage:
    python datasets/prepare_cocofied_lvis.py [--root DATASETS_ROOT]

Reads  lvis/lvis_v0.5_{train,val}.json (whichever exist)
Writes lvis/lvis_v0.5_{train,val}_cocofied.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fsgd_tpu.data.datasets.builtin_meta import COCO_CATEGORIES


def cocofy(src, dst):
    with open(src) as f:
        lvis = json.load(f)

    # COCO thing-class name -> COCO category id (80 classes)
    coco_name_to_id = {name: cid for cid, isthing, _, name in COCO_CATEGORIES if isthing == 1}

    # LVIS category id -> COCO category id via any matching synonym
    # (LVIS synonyms use underscores, COCO names use spaces)
    lvis_to_coco = {}
    for cat in lvis["categories"]:
        for syn in cat.get("synonyms", [cat.get("name", "")]):
            coco_id = coco_name_to_id.get(syn.replace("_", " "))
            if coco_id is not None:
                lvis_to_coco[cat["id"]] = coco_id
                break

    annotations = []
    for ann in lvis["annotations"]:
        coco_id = lvis_to_coco.get(ann["category_id"])
        if coco_id is not None:
            annotations.append(dict(ann, category_id=coco_id))

    categories = [{"id": cid, "name": name, "supercategory": ""}
                  for cid, isthing, _, name in COCO_CATEGORIES if isthing == 1]
    # LVIS images carry not_exhaustive/neg_category_ids lists; cocofy them too
    images = []
    for img in lvis["images"]:
        img = dict(img)
        for key in ("not_exhaustive_category_ids", "neg_category_ids"):
            if key in img:
                img[key] = sorted({lvis_to_coco[c] for c in img[key] if c in lvis_to_coco})
        images.append(img)

    with open(dst, "w") as f:
        json.dump({"info": lvis.get("info", {}), "images": images,
                   "categories": categories, "annotations": annotations}, f)
    print("  %s: %d/%d LVIS categories map to COCO; kept %d/%d annotations"
          % (dst, len(lvis_to_coco), len(lvis["categories"]),
             len(annotations), len(lvis["annotations"])))


def main(root):
    found = False
    for split in ("train", "val"):
        src = os.path.join(root, "lvis", "lvis_v0.5_%s.json" % split)
        if os.path.isfile(src):
            found = True
            cocofy(src, src.replace(".json", "_cocofied.json"))
    if not found:
        print("no lvis/lvis_v0.5_*.json under %s — nothing to do" % root)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default=os.environ.get("FSGD_DATASETS",
                                                    os.path.dirname(os.path.abspath(__file__))))
    main(p.parse_args().root)
