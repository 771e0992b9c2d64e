"""Evaluator protocol + dataset inference loop.

Parity with detectron2/evaluation/evaluator.py:1-348: ``DatasetEvaluator``,
``DatasetEvaluators``, ``inference_on_dataset`` (with warmup-aware timing and
the fork's 4-tuple unpack when ``global_cfg.MODEL.GAMBLER_ON``,
evaluator.py:188-192), ``inference_context``, plus the fork's ``Analyzer``
per-image AP dump (:93-147) and ``load_old_inference_results`` (:233-265).
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import time
from collections import OrderedDict
from contextlib import contextmanager
from typing import List, Optional

from ..config import global_cfg
from ..utils import comm
from ..utils.logger import log_every_n_seconds

logger = logging.getLogger(__name__)

__all__ = [
    "DatasetEvaluator",
    "DatasetEvaluators",
    "inference_on_dataset",
    "inference_context",
    "Analyzer",
    "load_old_inference_results",
]


class DatasetEvaluator:
    def reset(self):
        pass

    def process(self, inputs, outputs):
        pass

    def evaluate(self):
        pass


class DatasetEvaluators(DatasetEvaluator):
    def __init__(self, evaluators: List[DatasetEvaluator]):
        super().__init__()
        self._evaluators = evaluators

    def reset(self):
        for evaluator in self._evaluators:
            evaluator.reset()

    def process(self, inputs, outputs):
        for evaluator in self._evaluators:
            evaluator.process(inputs, outputs)

    def evaluate(self):
        results = OrderedDict()
        for evaluator in self._evaluators:
            result = evaluator.evaluate()
            if result is not None:
                for k, v in result.items():
                    assert k not in results, "Different evaluators produce results with the same key {}".format(k)
                    results[k] = v
        return results


@contextmanager
def inference_context(model):
    """Temporarily switch a model to eval mode."""
    training_mode = getattr(model, "training", False)
    if hasattr(model, "eval"):
        model.eval()
    yield
    if hasattr(model, "train"):
        model.train(training_mode)


def inference_on_dataset(model, data_loader, evaluator: Optional[DatasetEvaluator]):
    """Run model on every batch, feed outputs to the evaluator, return metrics.

    The model is called with reference-style ``batched_inputs``; when the
    gambler is on the forward returns the fork's eval 4-tuple and the last
    element holds the processed results (reference evaluator.py:188-192).
    """
    num_devices = comm.get_world_size()
    try:
        total = len(data_loader)
    except TypeError:
        total = None
    logger.info("Start inference on %s batches", total if total is not None else "?")
    if evaluator is None:
        evaluator = DatasetEvaluators([])
    evaluator.reset()

    num_warmup = min(5, (total or 11) - 1)
    start_time = time.perf_counter()
    total_compute_time = 0.0
    idx = -1
    with inference_context(model):
        for idx, inputs in enumerate(data_loader):
            if idx == num_warmup:
                start_time = time.perf_counter()
                total_compute_time = 0.0
            start_compute_time = time.perf_counter()
            outputs = model(inputs)
            if isinstance(outputs, tuple):
                # gambler fork contract: (images, raw_preds, None, results)
                _, _, _, outputs = outputs
            total_compute_time += time.perf_counter() - start_compute_time
            evaluator.process(inputs, outputs)

            iters_after_start = idx + 1 - num_warmup * int(idx >= num_warmup)
            seconds_per_img = total_compute_time / max(iters_after_start, 1)
            if idx >= num_warmup * 2 or seconds_per_img > 5:
                eta = datetime.timedelta(
                    seconds=int(seconds_per_img * ((total or idx + 1) - idx - 1))
                )
                log_every_n_seconds(
                    logging.INFO,
                    "Inference done {}/{}. {:.4f} s / img. ETA={}".format(idx + 1, total, seconds_per_img, eta),
                    n=5,
                )

    total_time = time.perf_counter() - start_time
    num_images = max(idx + 1 - num_warmup, 1)
    logger.info(
        "Total inference time: %s (%.6f s / img per device, on %d devices)",
        str(datetime.timedelta(seconds=total_time)),
        total_time / num_images,
        num_devices,
    )
    results = evaluator.evaluate()
    if results is None:
        results = {}
    return results


class Analyzer:
    """Per-image AP analysis dump (fork's Analyzer, evaluator.py:93-147):
    collects per-image evaluation results for model comparison studies."""

    def __init__(self, dataset_name: str, output_dir: str):
        self.dataset_name = dataset_name
        self.output_dir = output_dir
        self.per_image = {}

    def add(self, image_id, metrics: dict):
        self.per_image[image_id] = metrics

    def save(self, filename: str = "per_image_ap.json"):
        os.makedirs(self.output_dir, exist_ok=True)
        path = os.path.join(self.output_dir, filename)
        with open(path, "w") as f:
            json.dump({str(k): v for k, v in self.per_image.items()}, f)
        logger.info("Saved per-image analysis to %s", path)
        return path


def load_old_inference_results(output_dir: str, name: str = "coco_instances_results.json"):
    """Reload previously dumped prediction json (fork evaluator.py:233-265)."""
    path = os.path.join(output_dir, name)
    with open(path) as f:
        return json.load(f)
