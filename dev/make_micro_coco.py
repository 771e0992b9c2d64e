#!/usr/bin/env python
"""Generate the checked-in micro-COCO fixture (VERDICT round-2 item 5).

8 real JPEGs (colored rectangles/ellipses on textured noise) + COCO-format
annotations, laid out exactly like the reference's ``prepare_for_tests.sh``
fixtures (reference datasets/prepare_for_tests.sh: $DATASETS/coco/val2017 +
annotations/instances_val2017_100.json), so every quick_schedules config runs
through the full CLI against it by pointing FSGD_DATASETS at the output root.

Emitted files (under <dest>/coco):
  val2017/*.jpg                                    8 images, 320x240
  annotations/instances_val2017_100.json           bbox + polygon segmentation
  annotations/person_keypoints_val2017_100.json    17-keypoint person subset
  annotations/panoptic_val2017_100.json            COCO panoptic format
  panoptic_val2017_100/*.png                       id-encoded panoptic PNGs

The panoptic PNGs use the COCO id encoding (id = R + 256 G + 65536 B); the
background is a single stuff segment (category 92 "banner") so that
``datasets/prepare_panoptic_fpn.py`` produces a non-trivial semantic PNG.

Deterministic; re-running reproduces identical files for a fixed PIL version.
Total size ~220 KB.
"""

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fsgd_tpu.data.datasets.builtin_meta import COCO_CATEGORIES  # noqa: E402

DEFAULT_DEST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "data", "datasets"
)
N_IMAGES = 8
W, H = 320, 240
# Annotated objects use the first three COCO ids (person keeps its 17
# keypoints), but the json "categories" tables list the FULL canonical sets
# (80 things / 133 panoptic) like every real COCO annotation file does — the
# builtin coco_2017_val_100 metadata pins the 80-name thing_classes list and
# load_coco_json cross-checks it.
INSTANCE_CATEGORIES = [
    {"id": cid, "name": name, "supercategory": name}
    for cid, isthing, _, name in COCO_CATEGORIES
    if isthing == 1
]
PANOPTIC_CATEGORIES = [
    {"id": cid, "name": name, "supercategory": name, "isthing": isthing,
     "color": list(color)}
    for cid, isthing, color, name in COCO_CATEGORIES
]
STUFF_CATEGORY = {"id": 92, "name": "banner", "supercategory": "textile", "isthing": 0}
COLORS = {1: (210, 60, 50), 2: (60, 200, 70), 3: (60, 80, 220)}
KP_NAMES = [
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip",
    "left_knee", "right_knee", "left_ankle", "right_ankle",
]


def id2rgb(seg_id):
    return (seg_id % 256, (seg_id // 256) % 256, seg_id // 65536)


def main(dest):
    rng = np.random.RandomState(20260817)
    root = os.path.join(dest, "coco")
    img_dir = os.path.join(root, "val2017")
    ann_dir = os.path.join(root, "annotations")
    pan_dir = os.path.join(root, "panoptic_val2017_100")
    for d in (img_dir, ann_dir, pan_dir):
        os.makedirs(d, exist_ok=True)

    images, annotations, kp_annotations, pan_images = [], [], [], []
    aid = 1
    for i in range(N_IMAGES):
        file_name = "%012d.jpg" % (i + 1)
        noise = (rng.rand(H, W, 3) * 60 + 90).astype(np.uint8)
        im_arr = noise.copy()
        # panoptic segment-id map; background = segment 1 (stuff "banner")
        seg_map = np.ones((H, W), np.int32)
        segments = [{"id": 1, "category_id": STUFF_CATEGORY["id"], "iscrowd": 0}]
        yy, xx = np.mgrid[0:H, 0:W]
        n_obj = rng.randint(1, 4)
        for _ in range(n_obj):
            cat = int(rng.choice([1, 2, 3]))
            w = int(rng.randint(40, 120))
            h = int(rng.randint(40, 110))
            x1 = int(rng.randint(0, W - w))
            y1 = int(rng.randint(0, H - h))
            x2, y2 = x1 + w, y1 + h
            if cat == 3:  # ellipse
                cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
                rx, ry = w / 2.0, h / 2.0
                mask = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0
                pts = []
                for t in np.linspace(0, 2 * np.pi, 12, endpoint=False):
                    pts += [cx + rx * np.cos(t), cy + ry * np.sin(t)]
                seg = [[round(v, 2) for v in pts]]
                area = float(np.pi * rx * ry)
            else:  # rectangle
                mask = (xx >= x1) & (xx < x2) & (yy >= y1) & (yy < y2)
                seg = [[x1, y1, x2, y1, x2, y2, x1, y2]]
                area = float(w * h)
            im_arr[mask] = COLORS[cat]
            seg_id = len(segments) + 1
            seg_map[mask] = seg_id
            segments.append({"id": seg_id, "category_id": cat, "iscrowd": 0})
            ann = {
                "id": aid,
                "image_id": i + 1,
                "category_id": cat,
                "bbox": [x1, y1, w, h],
                "area": area,
                "iscrowd": 0,
                "segmentation": seg,
            }
            annotations.append(ann)
            if cat == 1:
                # 17 keypoints on a small grid inside the box, all visible
                kps = []
                for k in range(17):
                    kx = x1 + (0.2 + 0.6 * (k % 4) / 3.0) * w
                    ky = y1 + (0.15 + 0.7 * (k // 4) / 4.0) * h
                    kps += [round(kx, 1), round(ky, 1), 2]
                kp_ann = dict(ann, keypoints=kps, num_keypoints=17)
                kp_annotations.append(kp_ann)
            aid += 1
        Image.fromarray(im_arr).save(os.path.join(img_dir, file_name), quality=80)
        images.append({"id": i + 1, "file_name": file_name, "width": W, "height": H})

        # finalize panoptic: recompute area/bbox from the final (occluded) map
        final_segments = []
        for s in segments:
            m = seg_map == s["id"]
            if not m.any():
                continue
            ys, xs = np.nonzero(m)
            final_segments.append(
                dict(s, area=int(m.sum()),
                     bbox=[int(xs.min()), int(ys.min()),
                           int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)])
            )
        pan_png = np.zeros((H, W, 3), np.uint8)
        for s in final_segments:
            r, g, b = id2rgb(s["id"])
            m = seg_map == s["id"]
            pan_png[m] = (r, g, b)
        pan_file = file_name.replace(".jpg", ".png")
        Image.fromarray(pan_png).save(os.path.join(pan_dir, pan_file))
        pan_images.append(
            {"image_id": i + 1, "file_name": pan_file, "segments_info": final_segments}
        )

    base = {"info": {"description": "fsgd_tpu micro-COCO test fixture"},
            "licenses": [], "images": images, "categories": INSTANCE_CATEGORIES}
    with open(os.path.join(ann_dir, "instances_val2017_100.json"), "w") as f:
        json.dump(dict(base, annotations=annotations), f)
    kp_categories = [dict(INSTANCE_CATEGORIES[0], keypoints=KP_NAMES,
                          skeleton=[[1, 2], [1, 3], [2, 4], [3, 5], [6, 7]])]
    with open(os.path.join(ann_dir, "person_keypoints_val2017_100.json"), "w") as f:
        json.dump(dict(base, categories=kp_categories,
                       annotations=[a for a in kp_annotations]), f)
    with open(os.path.join(ann_dir, "panoptic_val2017_100.json"), "w") as f:
        json.dump({"info": base["info"], "licenses": [], "images": images,
                   "categories": PANOPTIC_CATEGORIES, "annotations": pan_images}, f)
    n_bytes = sum(
        os.path.getsize(os.path.join(dp, fn))
        for dp, _, fns in os.walk(root) for fn in fns
    )
    print("micro-COCO at %s: %d images, %d instances (%d with keypoints), "
          "%d panoptic PNGs, %.1f KB"
          % (root, len(images), len(annotations), len(kp_annotations),
             len(pan_images), n_bytes / 1024.0))


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dest", default=DEFAULT_DEST,
                   help="dataset root to write into (default: tests/data/datasets)")
    main(p.parse_args().dest)
