"""Benchmark harness: the north-star Faster R-CNN R-50-FPN train step on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference trains Faster R-CNN R-50-FPN at
0.210 s/iter with global batch 16 on 8x V100 = 9.52 images/sec per V100 chip.
``vs_baseline`` is our per-chip train img/s divided by that (the BASELINE.json
target is >= 2x).
"""

import json
import time

import numpy as np


def _build_faster_rcnn(image_hw, compute_dtype, max_gt):
    from fsgd_tpu.config import get_cfg
    from fsgd_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file("configs/COCO-Detection/faster_rcnn_R_50_FPN_1x.yaml")
    cfg.DATASETS.TRAIN = ()
    cfg.DATASETS.TEST = ()
    cfg.TPU.COMPUTE_DTYPE = compute_dtype
    cfg.TPU.MAX_GT_PER_IMAGE = max_gt
    cfg.TPU.IMAGE_BUCKETS = [list(image_hw)]
    return cfg, build_model(cfg)


def main():
    import os

    import jax

    # persistent compile cache: the first 800x1344 compile takes ~8 min via
    # the remote TPU compiler; subsequent bench runs reuse the executable
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from __graft_entry__ import _synthetic_batch
    from fsgd_tpu.parallel import create_train_state, make_train_step
    from fsgd_tpu.solver import build_optimizer

    on_tpu = jax.default_backend() != "cpu"
    # 800x1344 is the reference's train bucket (800 short side / 1333 max)
    h, w = (800, 1344) if on_tpu else (128, 128)
    batch = 8 if on_tpu else 2
    max_gt = 64 if on_tpu else 8

    cfg, model = _build_faster_rcnn((h, w), "bfloat16" if on_tpu else "float32", max_gt)
    params = model.init_params(jax.random.PRNGKey(0), image_size=(h, w))
    optimizer = build_optimizer(cfg, params)
    state = create_train_state(params, optimizer)
    step = make_train_step(model.loss_fn, optimizer, mesh=None, donate=True)

    np_batch = _synthetic_batch(batch, h, w, max_gt=max_gt, seed=0)
    device_batch = jax.tree.map(jax.device_put, np_batch)

    state, metrics = step(state, device_batch, jax.random.PRNGKey(0))  # compile
    jax.block_until_ready(metrics["total_loss"])

    iters = 20 if on_tpu else 2
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, device_batch, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(metrics["total_loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    baseline_v100 = 16 / 0.210 / 8  # 9.52 img/s/chip (MODEL_ZOO.md:112-117)
    print(
        json.dumps(
            {
                "metric": "faster_rcnn_r50fpn_train_imgs_per_sec_per_chip",
                "value": round(imgs_per_sec, 3),
                "unit": "img/s/chip (800x1344 bf16 batch {} synthetic)".format(batch),
                "vs_baseline": round(imgs_per_sec / baseline_v100, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
