#!/usr/bin/env python
"""One-off perf probe: train-step time vs batch size (and optional profile).

Usage:
  python dev/perf_probe.py --metric faster_rcnn_r50fpn_train --batches 8,12,16
  python dev/perf_probe.py --metric faster_rcnn_r50fpn_train --batches 8 \
      --profile /tmp/prof

img/s/chip is the bench metric; larger per-chip batches amortize the
fixed-overhead small ops (NMS, sampling) over more images.  This probe finds
the throughput-optimal batch for BENCH_DETAIL rows.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metric", default="faster_rcnn_r50fpn_train")
    ap.add_argument("--batches", default="8,12,16")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--profile", default="")
    args = ap.parse_args()

    import jax

    import bench

    bench._enable_compile_cache()
    h, w, _, max_gt, compute, _ = bench._shapes()
    name, kind = args.metric.rsplit("_", 1)

    for b in [int(x) for x in args.batches.split(",")]:
        try:
            if kind == "train":
                from fsgd_tpu.parallel import create_train_state, make_train_step
                from fsgd_tpu.solver import build_optimizer

                cfg, model = bench._build(name, (h, w), compute, max_gt)
                params = model.init_params(jax.random.PRNGKey(0), image_size=(h, w))
                optimizer = build_optimizer(cfg, params)
                state = create_train_state(params, optimizer)
                step = make_train_step(model.loss_fn, optimizer, mesh=None, donate=True)
                device_batch = jax.tree.map(jax.device_put, bench._batch(name, b, h, w, max_gt))
                state, metrics = step(state, device_batch, jax.random.PRNGKey(0))
                jax.block_until_ready(metrics["total_loss"])
                if args.profile:
                    with jax.profiler.trace(args.profile):
                        for i in range(3):
                            state, metrics = step(state, device_batch, jax.random.PRNGKey(i + 1))
                        jax.block_until_ready(metrics["total_loss"])
                t0 = time.perf_counter()
                for i in range(args.iters):
                    state, metrics = step(state, device_batch, jax.random.PRNGKey(i + 1))
                jax.block_until_ready(metrics["total_loss"])
                dt = time.perf_counter() - t0
                del state, params, optimizer, step
            else:
                cfg, model = bench._build(name, (h, w), compute, max_gt=8)
                params = model.init_params(jax.random.PRNGKey(0), image_size=(h, w))
                fwd = jax.jit(model.inference_fn)
                device_batch = jax.tree.map(jax.device_put, bench._batch(name, b, h, w, 8))
                out = fwd(params, device_batch)
                jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = fwd(params, device_batch)
                jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
                dt = time.perf_counter() - t0
                del params
            print(
                "PROBE {} batch={}: {:.1f} ms/step, {:.2f} img/s".format(
                    args.metric, b, 1000 * dt / args.iters, b * args.iters / dt
                ),
                flush=True,
            )
        except Exception as e:
            print("PROBE {} batch={}: FAILED {}".format(args.metric, b, repr(e)[:300]), flush=True)


if __name__ == "__main__":
    main()
