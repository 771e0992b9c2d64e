#!/usr/bin/env python
"""TridentNet training script.

Parity target: projects/TridentNet/train_net.py:15-67 — DefaultTrainer with
COCO evaluation over the trident configs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from fsgd_tpu.config import get_cfg
from fsgd_tpu.engine import DefaultTrainer, default_argument_parser, default_setup, launch
from fsgd_tpu.evaluation import COCOEvaluator, verify_results
from fsgd_tpu.projects.tridentnet import add_tridentnet_config
from fsgd_tpu.utils import comm


class Trainer(DefaultTrainer):
    @classmethod
    def build_evaluator(cls, cfg, dataset_name):
        output_folder = os.path.join(cfg.OUTPUT_DIR, "inference")
        return COCOEvaluator(dataset_name, cfg, True, output_dir=output_folder)


def setup(args):
    cfg = get_cfg()
    add_tridentnet_config(cfg)
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    return cfg


def main(args):
    cfg = setup(args)

    if args.eval_only:
        import jax

        from fsgd_tpu.checkpoint import Checkpointer

        model = Trainer.build_model(cfg)
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
