"""Default trainer/predictor/CLI wiring.

Parity with detectron2/engine/defaults.py:45-495: ``default_argument_parser``
(including the fork's ``--eval_visualize`` and ``--source`` flags,
defaults.py:62-63), ``default_setup`` (logger + seed + cfg dump + env dump),
``DefaultPredictor`` and ``DefaultTrainer`` (model/optimizer/loader/hooks
assembly, resume_or_load, test()).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from collections import OrderedDict

import jax
import numpy as np

from ..checkpoint import Checkpointer
from ..config import CfgNode
from ..data import build_detection_test_loader, build_detection_train_loader
from ..data import detection_utils as utils
from ..data.catalog import MetadataCatalog
from ..evaluation import (
    COCOEvaluator,
    DatasetEvaluator,
    inference_on_dataset,
    print_csv_format,
    verify_results,
)
from ..models import build_model
from ..parallel import TrainState, create_mesh_from_cfg
from ..solver import build_lr_scheduler, build_optimizer
from ..utils import comm
from ..utils.env import collect_env_info, seed_all_rng
from ..utils.events import CommonMetricPrinter, JSONWriter, TensorboardXWriter
from ..utils.logger import setup_logger
from . import hooks
from .train_loop import SimpleTrainer

__all__ = ["default_argument_parser", "default_setup", "DefaultPredictor", "DefaultTrainer"]


def default_argument_parser():
    parser = argparse.ArgumentParser(description="fsgd_tpu Training")
    parser.add_argument("--config-file", default="", metavar="FILE", help="path to config file")
    parser.add_argument("--resume", action="store_true", help="resume from OUTPUT_DIR checkpoints")
    parser.add_argument("--eval-only", action="store_true", help="perform evaluation only")
    # fork additions (reference defaults.py:62-63)
    parser.add_argument("--eval_visualize", action="store_true", help="evaluate and visualize betting maps")
    parser.add_argument("--source", default="", help="source experiment directory for analysis")
    parser.add_argument("--num-gpus", type=int, default=1, help="accepted for CLI compat; devices come from the mesh")
    parser.add_argument("--num-machines", type=int, default=1)
    parser.add_argument("--machine-rank", type=int, default=0)
    parser.add_argument("--dist-url", default="auto")
    parser.add_argument(
        "opts",
        help="Modify config options using the command-line",
        default=None,
        nargs=argparse.REMAINDER,
    )
    return parser


def default_setup(cfg, args):
    output_dir = cfg.OUTPUT_DIR
    if comm.is_main_process() and output_dir:
        os.makedirs(output_dir, exist_ok=True)
    rank = comm.get_rank()
    logger = setup_logger(output_dir, distributed_rank=rank)
    logger.info("Rank of current process: {}. World size: {}".format(rank, comm.get_world_size()))
    logger.info("Environment info:\n" + collect_env_info())
    logger.info("Command line arguments: " + str(args))
    if hasattr(args, "config_file") and args.config_file:
        logger.info("Contents of args.config_file={}".format(args.config_file))
    if comm.is_main_process() and output_dir:
        path = os.path.join(output_dir, "config.yaml")
        with open(path, "w") as f:
            f.write(cfg.dump())
        logger.info("Full config saved to {}".format(os.path.abspath(path)))
    seed_all_rng(None if cfg.SEED < 0 else cfg.SEED + rank)
    cache_dir = getattr(cfg.TPU, "COMPILE_CACHE_DIR", "")
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
            logger.info("XLA compile cache at {}".format(os.path.abspath(cache_dir)))
        except Exception:
            logger.exception("could not enable the XLA compile cache")
    return logger


class DefaultPredictor:
    """Single-image inference with the cfg's test-time resize
    (reference defaults.py:134-191)."""

    def __init__(self, cfg):
        self.cfg = cfg.clone()
        self.model = build_model(self.cfg)
        self.model.eval()

        bucket = tuple(cfg.TPU.IMAGE_BUCKETS[0])
        self.model.params = self.model.init_params(jax.random.PRNGKey(0), image_size=(128, 128))
        if cfg.MODEL.WEIGHTS:
            checkpointer = Checkpointer(model=self.model.params)
            checkpointer.load(cfg.MODEL.WEIGHTS)
            self.model.params = checkpointer.checkpointables["model"]

        from ..data.transforms.transform_gen import ResizeShortestEdge

        self.transform_gen = ResizeShortestEdge(
            [cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MIN_SIZE_TEST], cfg.INPUT.MAX_SIZE_TEST
        )
        self.input_format = cfg.INPUT.FORMAT
        assert self.input_format in ["RGB", "BGR"], self.input_format

    def __call__(self, original_image: np.ndarray):
        if self.input_format == "RGB":
            original_image = original_image[:, :, ::-1]
        height, width = original_image.shape[:2]
        image = self.transform_gen.get_transform(original_image).apply_image(original_image)
        inputs = {"image": image.astype(np.float32), "height": height, "width": width}
        outputs = self.model([inputs])
        if isinstance(outputs, tuple):  # gambler fork eval contract
            outputs = outputs[3]
        return outputs[0]


class DefaultTrainer(SimpleTrainer):
    def __init__(self, cfg):
        logger = logging.getLogger("fsgd_tpu")
        if not logger.isEnabledFor(logging.INFO):
            setup_logger()
        self.cfg = cfg

        model = self.build_model(cfg)
        bucket = tuple(cfg.TPU.IMAGE_BUCKETS[0])
        rng = jax.random.PRNGKey(cfg.SEED if cfg.SEED >= 0 else 0)
        model.params = model.init_params(rng, image_size=bucket)

        optimizer = self.build_optimizer(cfg, model.params)
        data_loader = self.build_train_loader(cfg)
        # data-parallel mesh only when the per-process batch shards evenly
        n_dev = len(jax.devices())
        per_process_batch = cfg.SOLVER.IMS_PER_BATCH // comm.get_world_size()
        mesh = (
            create_mesh_from_cfg(cfg)
            if n_dev > 1 and per_process_batch % n_dev == 0
            else None
        )

        super().__init__(model, data_loader, optimizer, mesh=mesh)
        self.scheduler = build_lr_scheduler(cfg)
        self.checkpointer = Checkpointer(
            cfg.OUTPUT_DIR,
            model=self.state.params,
            optimizer=self.state.opt_state,
        )
        self.start_iter = 0
        self.max_iter = cfg.SOLVER.MAX_ITER
        self.register_hooks(self.build_hooks())

    def resume_or_load(self, resume: bool = True):
        self.checkpointer.checkpointables["model"] = self.state.params
        self.checkpointer.checkpointables["optimizer"] = self.state.opt_state
        extra = self.checkpointer.resume_or_load(self.cfg.MODEL.WEIGHTS, resume=resume)
        params = self.checkpointer.checkpointables["model"]
        opt_state = self.checkpointer.checkpointables["optimizer"]
        step = int(extra.get("iteration", -1)) + 1 if resume else 0
        import jax.numpy as jnp

        self.state = TrainState(params, opt_state, jnp.asarray(step, jnp.int32))
        self.model.params = params
        self.start_iter = step

    def build_hooks(self):
        cfg = self.cfg
        ret = [
            hooks.IterationTimer(),
            hooks.LRScheduler(self.scheduler),
            hooks.PeriodicCheckpointerHook(
                self.checkpointer,
                cfg.SOLVER.CHECKPOINT_PERIOD,
                state_getter=lambda t: {"model": t.state.params, "optimizer": t.state.opt_state},
            )
            if comm.is_main_process()
            else None,
        ]

        if cfg.TEST.PRECISE_BN.ENABLED:
            # before eval/checkpoint hooks so recomputed stats are used by both
            # (reference defaults.py build_hooks ordering)
            ret.append(
                hooks.PreciseBN(
                    cfg.TEST.EVAL_PERIOD,
                    self.model,
                    self.build_train_loader(cfg),
                    cfg.TEST.PRECISE_BN.NUM_ITER,
                )
            )

        def test_and_save_results():
            self._last_eval_results = self.test(self.cfg, self.model)
            return self._last_eval_results

        if cfg.TEST.EVAL_PERIOD > 0:
            ret.append(hooks.EvalHook(cfg.TEST.EVAL_PERIOD, test_and_save_results))
        if comm.is_main_process():
            ret.append(hooks.PeriodicWriter(self.build_writers(), period=20))
        return ret

    def build_writers(self):
        return [
            CommonMetricPrinter(self.max_iter),
            JSONWriter(os.path.join(self.cfg.OUTPUT_DIR, "metrics.json")),
            TensorboardXWriter(self.cfg.OUTPUT_DIR),
        ]

    def train(self):
        super().train(self.start_iter, self.max_iter)
        if comm.is_main_process() and hasattr(self, "_last_eval_results"):
            verify_results(self.cfg, self._last_eval_results)
            return self._last_eval_results

    # -- component builders (overridable classmethods) -----------------------
    @classmethod
    def build_model(cls, cfg):
        model = build_model(cfg)
        logging.getLogger(__name__).info("Model built: %s", type(model).__name__)
        return model

    @classmethod
    def build_optimizer(cls, cfg, params):
        return build_optimizer(cfg, params)

    @classmethod
    def build_train_loader(cls, cfg):
        return build_detection_train_loader(cfg)

    @classmethod
    def build_test_loader(cls, cfg, dataset_name):
        return build_detection_test_loader(cfg, dataset_name)

    @classmethod
    def build_evaluator(cls, cfg, dataset_name) -> DatasetEvaluator:
        evaluator_type = MetadataCatalog.get(dataset_name).get("evaluator_type", "coco")
        if evaluator_type == "coco":
            return COCOEvaluator(dataset_name, cfg, True, output_dir=cfg.OUTPUT_DIR)
        if evaluator_type == "lvis":
            from ..evaluation import LVISEvaluator

            return LVISEvaluator(dataset_name, cfg, True, output_dir=cfg.OUTPUT_DIR)
        if evaluator_type == "pascal_voc":
            from ..evaluation import PascalVOCDetectionEvaluator

            return PascalVOCDetectionEvaluator(dataset_name)
        if evaluator_type == "sem_seg":
            from ..evaluation import SemSegEvaluator

            return SemSegEvaluator(dataset_name, True, output_dir=cfg.OUTPUT_DIR)
        if evaluator_type == "cityscapes":
            from ..evaluation import CityscapesEvaluator

            return CityscapesEvaluator(dataset_name, output_dir=cfg.OUTPUT_DIR)
        raise NotImplementedError(
            "No evaluator implemented for dataset {} of type {}".format(dataset_name, evaluator_type)
        )

    @classmethod
    def test(cls, cfg, model, evaluators=None):
        """Evaluate on every cfg.DATASETS.TEST dataset (reference defaults.py:445-495)."""
        logger = logging.getLogger(__name__)
        if isinstance(evaluators, DatasetEvaluator):
            evaluators = [evaluators]
        results = OrderedDict()
        for idx, dataset_name in enumerate(cfg.DATASETS.TEST):
            data_loader = cls.build_test_loader(cfg, dataset_name)
            if evaluators is not None:
                evaluator = evaluators[idx]
            else:
                try:
                    evaluator = cls.build_evaluator(cfg, dataset_name)
                except NotImplementedError:
                    logger.warning("No evaluator for {}; skipping evaluation".format(dataset_name))
                    results[dataset_name] = {}
                    continue
            results_i = inference_on_dataset(model, data_loader, evaluator)
            results[dataset_name] = results_i
            if comm.is_main_process():
                assert isinstance(results_i, dict)
                print_csv_format(results_i)
        if len(results) == 1:
            results = list(results.values())[0]
        return results
