#!/usr/bin/env python
"""Data-independent convergence gates (VERDICT round-1 item 2).

Trains Faster R-CNN and RetinaNet from scratch on 16 fixed synthetic images
(colored rectangles on noise, 3 classes) until the detector reproduces its
own training set: self-eval AP50 must exceed the gate.  This proves the full
stack *learns* — matching, sampling, losses, optimizer, inference decode and
COCO evaluation — not just that losses descend.

The reference's equivalent gates are the quick_schedules training_acc_test
configs (e.g. configs/quick_schedules/mask_rcnn_R_50_FPN_training_acc_test.yaml)
which need COCO on disk; this harness is self-contained.

Usage:  python dev/run_convergence.py [--models faster_rcnn,retinanet]
Writes CONVERGENCE.json rows: {"model", "ap50", "iters", "gate", "passed"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_IMAGES = 16
IMG_SIZE = 320
NUM_CLASSES = 3
MAX_GT = 8
COLORS = np.array([[200, 40, 40], [40, 200, 40], [40, 60, 220]], np.float32)


def make_dataset(seed=7):
    """16 images of colored rectangles; class = color. Deterministic."""
    rng = np.random.RandomState(seed)
    images, gts = [], []
    for _ in range(NUM_IMAGES):
        img = rng.rand(IMG_SIZE, IMG_SIZE, 3).astype(np.float32) * 40 + 100
        n = rng.randint(1, 4)
        boxes, classes = [], []
        for _ in range(n):
            w, h = rng.randint(48, 130, 2)
            x1 = rng.randint(0, IMG_SIZE - w)
            y1 = rng.randint(0, IMG_SIZE - h)
            c = rng.randint(0, NUM_CLASSES)
            img[y1 : y1 + h, x1 : x1 + w] = COLORS[c] + rng.randn(h, w, 3) * 8
            boxes.append([x1, y1, x1 + w, y1 + h])
            classes.append(c)
        images.append(img)
        gts.append((np.array(boxes, np.float32), np.array(classes, np.int32)))
    return images, gts


def make_batch(images, gts, idxs):
    b = len(idxs)
    batch = {
        "image": np.stack([images[i] for i in idxs]),
        "image_size": np.tile([[IMG_SIZE, IMG_SIZE]], (b, 1)).astype(np.int32),
        "out_size": np.tile([[IMG_SIZE, IMG_SIZE]], (b, 1)).astype(np.int32),
        "gt_boxes": np.zeros((b, MAX_GT, 4), np.float32),
        "gt_classes": np.zeros((b, MAX_GT), np.int32),
        "gt_valid": np.zeros((b, MAX_GT), bool),
    }
    for j, i in enumerate(idxs):
        boxes, classes = gts[i]
        n = len(classes)
        batch["gt_boxes"][j, :n] = boxes
        batch["gt_classes"][j, :n] = classes
        batch["gt_valid"][j, :n] = True
    return batch


def build_cfg(model_name):
    from fsgd_tpu.config import get_cfg

    cfg = get_cfg()
    if model_name == "faster_rcnn":
        cfg.merge_from_file("configs/COCO-Detection/faster_rcnn_R_50_FPN_1x.yaml")
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = NUM_CLASSES
        cfg.SOLVER.BASE_LR = 0.02
    else:
        cfg.merge_from_file("configs/COCO-Detection/retinanet_R_50_FPN_1x.yaml")
        cfg.MODEL.RETINANET.NUM_CLASSES = NUM_CLASSES
        cfg.SOLVER.BASE_LR = 0.01
    cfg.MODEL.WEIGHTS = ""
    cfg.DATASETS.TRAIN = ()
    cfg.DATASETS.TEST = ()
    # from-scratch training: no frozen stages, GN so random init is stable
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.RESNETS.NORM = "GN"
    cfg.MODEL.FPN.NORM = "GN"
    cfg.SOLVER.WARMUP_ITERS = 100
    cfg.SOLVER.STEPS = (100000,)  # constant LR after warmup
    cfg.TPU.MAX_GT_PER_IMAGE = MAX_GT
    cfg.TPU.IMAGE_BUCKETS = [[IMG_SIZE, IMG_SIZE]]
    import jax

    cfg.TPU.COMPUTE_DTYPE = "bfloat16" if jax.default_backend() != "cpu" else "float32"
    return cfg


def eval_ap50(model, params, images, gts, batch_size=8):
    """Self-eval AP50 through the vendored COCO api/COCOeval."""
    import jax

    from fsgd_tpu.data.cocoapi import COCO
    from fsgd_tpu.evaluation.cocoeval import COCOeval

    gt_json = {
        "images": [
            {"id": i, "width": IMG_SIZE, "height": IMG_SIZE} for i in range(NUM_IMAGES)
        ],
        "categories": [{"id": c + 1, "name": str(c)} for c in range(NUM_CLASSES)],
        "annotations": [],
    }
    aid = 1
    for i, (boxes, classes) in enumerate(gts):
        for b, c in zip(boxes, classes):
            x1, y1, x2, y2 = [float(v) for v in b]
            gt_json["annotations"].append(
                {
                    "id": aid,
                    "image_id": i,
                    "category_id": int(c) + 1,
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": (x2 - x1) * (y2 - y1),
                    "iscrowd": 0,
                }
            )
            aid += 1
    coco_gt = COCO()
    coco_gt.dataset = gt_json
    coco_gt.createIndex()

    fwd = jax.jit(model.inference_fn)
    results = []
    for start in range(0, NUM_IMAGES, batch_size):
        idxs = list(range(start, min(start + batch_size, NUM_IMAGES)))
        batch = {k: jax.numpy.asarray(v) for k, v in make_batch_infer(idxs, images).items()}
        out = fwd(params, batch)
        dets = out[-1] if isinstance(out, tuple) else out
        boxes = np.asarray(dets["boxes"], np.float64)
        scores = np.asarray(dets["scores"], np.float64)
        classes = np.asarray(dets["classes"])
        valid = np.asarray(dets["valid"])
        for j, i in enumerate(idxs):
            for d in range(boxes.shape[1]):
                if not valid[j, d]:
                    continue
                x1, y1, x2, y2 = boxes[j, d]
                results.append(
                    {
                        "image_id": i,
                        "category_id": int(classes[j, d]) + 1,
                        "bbox": [x1, y1, x2 - x1, y2 - y1],
                        "score": float(scores[j, d]),
                    }
                )
    if not results:
        return 0.0
    coco_dt = coco_gt.loadRes(results)
    ev = COCOeval(coco_gt, coco_dt, "bbox")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    return float(ev.stats[1])  # AP50


def make_batch_infer(idxs, images):
    b = len(idxs)
    return {
        "image": np.stack([images[i] for i in idxs]),
        "image_size": np.tile([[IMG_SIZE, IMG_SIZE]], (b, 1)).astype(np.int32),
        "out_size": np.tile([[IMG_SIZE, IMG_SIZE]], (b, 1)).astype(np.int32),
    }


def run(model_name, max_iters, gate=0.9, batch_size=8, eval_every=200, log=print):
    import jax

    from fsgd_tpu.models import build_model
    from fsgd_tpu.parallel import create_train_state, make_train_step
    from fsgd_tpu.solver import build_optimizer

    images, gts = make_dataset()
    cfg = build_cfg(model_name)
    model = build_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0), image_size=(IMG_SIZE, IMG_SIZE))
    optimizer = build_optimizer(cfg, params)
    state = create_train_state(params, optimizer)
    step = make_train_step(model.loss_fn, optimizer, mesh=None, donate=True)

    rng = np.random.RandomState(0)
    t0 = time.time()
    ap50, it = 0.0, 0
    for it in range(1, max_iters + 1):
        idxs = rng.choice(NUM_IMAGES, batch_size, replace=False)
        batch = {k: jax.numpy.asarray(v) for k, v in make_batch(images, gts, idxs).items()}
        state, metrics = step(state, batch, jax.random.PRNGKey(it))
        if it % 50 == 0:
            loss = float(metrics["total_loss"])
            log(f"[{model_name}] iter {it}: loss {loss:.4f} ({time.time() - t0:.0f}s)")
        if it % eval_every == 0 or it == max_iters:
            ap50 = eval_ap50(model, state.params, images, gts, batch_size)
            log(f"[{model_name}] iter {it}: AP50 {ap50:.4f}")
            if ap50 >= gate:
                break
    return {
        "model": model_name,
        "ap50": round(ap50, 4),
        "iters": it,
        "gate": gate,
        "passed": bool(ap50 >= gate),
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="faster_rcnn,retinanet")
    ap.add_argument("--max-iters", type=int, default=1500)
    ap.add_argument("--gate", type=float, default=0.9)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        )
    except Exception:
        pass

    rows = [run(m.strip(), args.max_iters, args.gate) for m in args.models.split(",")]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CONVERGENCE.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows))
    if not all(r["passed"] for r in rows):
        sys.exit(1)


if __name__ == "__main__":
    main()
