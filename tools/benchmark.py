#!/usr/bin/env python
"""Throughput benchmark CLI (role of reference tools/benchmark.py):
measures data-loader, training and evaluation throughput for a config."""

import argparse
import itertools
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

logger = logging.getLogger("fsgd_tpu.benchmark")


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--task", choices=["train", "eval", "data"], default="train")
    parser.add_argument("--num-iters", type=int, default=40)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser.parse_args()


def setup(args):
    from fsgd_tpu.config import get_cfg
    from fsgd_tpu.engine import default_setup

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    return cfg


def benchmark_data(cfg, num_iters):
    from fsgd_tpu.data import build_detection_train_loader

    loader = iter(build_detection_train_loader(cfg))
    next(loader)  # warmup
    t0 = time.perf_counter()
    images = 0
    for _ in range(num_iters):
        batch = next(loader)
        images += batch["image"].shape[0]
    dt = time.perf_counter() - t0
    logger.info("data loading: %.2f img/s", images / dt)


def benchmark_train(cfg, num_iters):
    from fsgd_tpu.data import build_detection_train_loader
    from fsgd_tpu.models import build_model
    from fsgd_tpu.parallel import create_train_state, make_train_step
    from fsgd_tpu.solver import build_optimizer

    model = build_model(cfg)
    bucket = tuple(cfg.TPU.IMAGE_BUCKETS[0])
    params = model.init_params(jax.random.PRNGKey(0), image_size=bucket)
    optimizer = build_optimizer(cfg, params)
    state = create_train_state(params, optimizer)
    step = make_train_step(model.loss_fn, optimizer)
    loader = iter(build_detection_train_loader(cfg))

    batch = next(loader)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))  # compile
    jax.block_until_ready(metrics["total_loss"])

    t0 = time.perf_counter()
    images = 0
    for i in range(num_iters):
        batch = next(loader)
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        images += batch["image"].shape[0]
    jax.block_until_ready(metrics["total_loss"])
    dt = time.perf_counter() - t0
    logger.info("training: %.3f s/iter, %.2f img/s", dt / num_iters, images / dt)


def benchmark_eval(cfg, num_iters):
    from fsgd_tpu.data import build_detection_test_loader
    from fsgd_tpu.models import build_model

    model = build_model(cfg)
    bucket = tuple(cfg.TPU.IMAGE_BUCKETS[0])
    model.params = model.init_params(jax.random.PRNGKey(0), image_size=bucket)
    model.eval()
    loader = build_detection_test_loader(cfg, cfg.DATASETS.TEST[0])
    it = itertools.cycle(iter(loader))
    model(next(it))  # compile
    t0 = time.perf_counter()
    for _ in range(num_iters):
        model(next(it))
    dt = time.perf_counter() - t0
    logger.info("inference: %.4f s/img", dt / num_iters)


def main():
    args = parse_args()
    cfg = setup(args)
    {"data": benchmark_data, "train": benchmark_train, "eval": benchmark_eval}[args.task](cfg, args.num_iters)


if __name__ == "__main__":
    main()
