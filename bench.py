"""Benchmark harness: RetinaNet R-50-FPN train-step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference trains RetinaNet R-50-FPN at 0.200 s/iter with global
batch 16 on 8x V100 (BASELINE.md / MODEL_ZOO.md:205-220) = 10 images/sec per
V100 chip.  ``vs_baseline`` is our per-chip img/s divided by that.
"""

import json
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import _build_model, _synthetic_batch
    from fsgd_tpu.parallel import create_train_state, make_train_step
    from fsgd_tpu.solver import build_optimizer

    # 800x1344 is the reference's train resolution bucket (800px short side,
    # 1333 max long side rounded to 64); batch 8 per chip.
    h, w = 800, 1344
    batch = 8
    on_tpu = jax.default_backend() != "cpu"
    if not on_tpu:  # CPU smoke fallback
        h = w = 128
        batch = 2

    cfg, model = _build_model((h, w), compute_dtype="bfloat16" if on_tpu else "float32", max_gt=64)
    params = model.init_params(jax.random.PRNGKey(0), image_size=(h, w))
    optimizer = build_optimizer(cfg, params)
    state = create_train_state(params, optimizer)
    step = make_train_step(model.loss_fn, optimizer, mesh=None, donate=True)

    np_batch = _synthetic_batch(batch, h, w, max_gt=64, seed=0)
    device_batch = jax.tree.map(jax.device_put, np_batch)

    # warmup / compile
    state, metrics = step(state, device_batch, jax.random.PRNGKey(0))
    jax.block_until_ready(metrics["total_loss"])

    iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, device_batch, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(metrics["total_loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    baseline_v100 = 10.0  # img/s/chip (reference RetinaNet R50-FPN, 8xV100)
    print(
        json.dumps(
            {
                "metric": "retinanet_r50fpn_train_imgs_per_sec_per_chip",
                "value": round(imgs_per_sec, 3),
                "unit": "img/s/chip (800x1344 bf16 batch {} synthetic)".format(batch),
                "vs_baseline": round(imgs_per_sec / baseline_v100, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
