#!/usr/bin/env python
"""Standard training CLI (role of reference tools/train_net.py, 166 LoC):
config -> DefaultTrainer with the right evaluator per dataset type, optional
--eval-only and TTA."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fsgd_tpu.checkpoint import Checkpointer
from fsgd_tpu.config import get_cfg
from fsgd_tpu.engine import DefaultTrainer, default_argument_parser, default_setup, launch
from fsgd_tpu.evaluation import verify_results
from fsgd_tpu.utils import comm


class Trainer(DefaultTrainer):
    """DefaultTrainer already dispatches evaluators by metadata type."""


def setup(args):
    from fsgd_tpu.projects import setup_project_cfg

    cfg = get_cfg()
    if args.config_file:
        setup_project_cfg(cfg, args.config_file)
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    return cfg


def main(args):
    cfg = setup(args)

    if args.eval_only:
        model = Trainer.build_model(cfg)
        import jax

        model.params = model.init_params(jax.random.PRNGKey(0), image_size=tuple(cfg.TPU.IMAGE_BUCKETS[0]))
        if cfg.MODEL.WEIGHTS:
            checkpointer = Checkpointer(cfg.OUTPUT_DIR, model=model.params)
            checkpointer.resume_or_load(cfg.MODEL.WEIGHTS, resume=args.resume)
            model.params = checkpointer.checkpointables["model"]
        model.eval()
        res = Trainer.test(cfg, model)
        if comm.is_main_process():
            verify_results(cfg, res)
        return res

    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    return trainer.train()


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    launch(
        main,
        args.num_gpus,
        num_machines=args.num_machines,
        machine_rank=args.machine_rank,
        dist_url=args.dist_url,
        args=(args,),
    )
