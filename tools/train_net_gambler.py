#!/usr/bin/env python
"""Gambler GAN training CLI — the fork's main entry point
(role of ImbalanceDetection/train_net.py:1203-1254): builds the GANTrainer
(detector + gambler, two optimizers, two checkpoint streams), supports
--eval-only and --eval_visualize (betting-map visualization)."""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from fsgd_tpu.checkpoint import Checkpointer, PeriodicCheckpointer
from fsgd_tpu.config import add_gambler_config, get_cfg, set_global_cfg
from fsgd_tpu.data import build_detection_test_loader, build_detection_train_loader
from fsgd_tpu.engine import default_argument_parser, default_setup, launch
from fsgd_tpu.engine.hooks import (
    DetectorLRScheduler,
    GamblerLRScheduler,
    IterationTimer,
    PeriodicCheckpointerHook,
    PeriodicWriter,
)
from fsgd_tpu.evaluation import COCOEvaluator, inference_on_dataset, print_csv_format
from fsgd_tpu.gambler import GANTrainer
from fsgd_tpu.gambler.visualization import visualize_inference
from fsgd_tpu.utils import comm
from fsgd_tpu.utils.events import CommonMetricPrinter, JSONWriter, TensorboardXWriter

logger = logging.getLogger("fsgd_tpu.gambler")


class Trainer(GANTrainer):
    """GANTrainer + the standard hook set split per model
    (reference train_net.py:846-960 build_hooks / build_hooks_gambler)."""

    def __init__(self, cfg):
        import jax

        from fsgd_tpu.parallel import create_mesh

        data_loader = build_detection_train_loader(cfg)
        # data-parallel mesh over all local chips (reference wraps both models
        # in DDP, train_net.py:528-533; here one jitted step per phase over ICI)
        n_dev = len(jax.devices())
        mesh = create_mesh(("data",), [n_dev]) if n_dev > 1 else None
        super().__init__(cfg, data_loader, mesh=mesh)

        # two checkpoint streams (reference train_net.py:541-558)
        self.checkpointer = Checkpointer(
            cfg.OUTPUT_DIR, model=self.det_state.params, optimizer=self.det_state.opt_state
        )
        self.gambler_checkpointer = Checkpointer(
            os.path.join(cfg.OUTPUT_DIR, "gambler_models"),
            model=self.gam_state.params,
            optimizer=self.gam_state.opt_state,
        )
        hooks = [
            IterationTimer(),
            DetectorLRScheduler(self.detector_schedule),
            GamblerLRScheduler(self.gambler_schedule),
        ]
        if comm.is_main_process():
            hooks.append(
                PeriodicCheckpointerHook(
                    self.checkpointer,
                    cfg.SOLVER.CHECKPOINT_PERIOD,
                    state_getter=lambda t: {"model": t.det_state.params, "optimizer": t.det_state.opt_state},
                )
            )
            hooks.append(
                PeriodicCheckpointerHook(
                    self.gambler_checkpointer,
                    cfg.SOLVER.CHECKPOINT_PERIOD,
                    state_getter=lambda t: {"model": t.gam_state.params, "optimizer": t.gam_state.opt_state},
                )
            )
            hooks.append(
                PeriodicWriter(
                    [
                        CommonMetricPrinter(cfg.SOLVER.MAX_ITER),
                        JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json")),
                        TensorboardXWriter(cfg.OUTPUT_DIR),
                    ]
                )
            )
        self.register_hooks(hooks)

    def resume_or_load(self, resume=True):
        extra = self.checkpointer.resume_or_load(self.cfg.MODEL.WEIGHTS, resume=resume)
        from fsgd_tpu.parallel import TrainState
        import jax.numpy as jnp

        self.det_state = TrainState(
            self.checkpointer.checkpointables["model"],
            self.checkpointer.checkpointables["optimizer"],
            jnp.asarray(int(extra.get("iteration", -1)) + 1, jnp.int32),
        )
        self.detection_model.params = self.det_state.params
        g = self.cfg.MODEL.GAMBLER_HEAD
        gambler_weights = g.WEIGHTS if g.LOAD_PRETRAINED_GAMBLER else ""
        self.gambler_checkpointer.resume_or_load(gambler_weights, resume=resume)
        self.gam_state = TrainState(
            self.gambler_checkpointer.checkpointables["model"],
            self.gambler_checkpointer.checkpointables["optimizer"],
            self.gam_state.step,
        )
        self.start_iter = int(extra.get("iteration", -1)) + 1

    def test(self):
        results = {}
        self.detection_model.eval()
        for dataset_name in self.cfg.DATASETS.TEST:
            loader = build_detection_test_loader(self.cfg, dataset_name)
            evaluator = COCOEvaluator(dataset_name, self.cfg, True, output_dir=self.cfg.OUTPUT_DIR)
            results[dataset_name] = inference_on_dataset(self.detection_model, loader, evaluator)
            if comm.is_main_process():
                print_csv_format(results[dataset_name])
        self.detection_model.train()
        return results

    def test_and_visualize(self):
        """Reference train_net.py:796-844: betting-map visualization + eval."""
        visualize_inference(
            self.detection_model,
            self.gambler_model,
            self.det_state.params,
            self.gam_state.params,
            iter(self.data_loader),
            self.cfg,
            num_batches=4,
        )
        return self.test()


def setup(args):
    cfg = get_cfg()
    add_gambler_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    set_global_cfg(cfg)
    return cfg


def main(args):
    cfg = setup(args)
    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    if args.eval_only:
        return trainer.test()
    if args.eval_visualize:
        return trainer.test_and_visualize()
    trainer.train(trainer.start_iter if hasattr(trainer, "start_iter") else 0, cfg.SOLVER.MAX_ITER)


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    launch(main, args.num_gpus, num_machines=args.num_machines,
           machine_rank=args.machine_rank, dist_url=args.dist_url, args=(args,))
