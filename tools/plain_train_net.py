#!/usr/bin/env python
"""Bare training loop without the trainer abstraction (role of reference
tools/plain_train_net.py, 230 LoC): explicit state, explicit hooks-free loop —
the template users fork for custom logic."""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from fsgd_tpu.checkpoint import Checkpointer, PeriodicCheckpointer
from fsgd_tpu.config import get_cfg
from fsgd_tpu.data import build_detection_test_loader, build_detection_train_loader
from fsgd_tpu.engine import default_argument_parser, default_setup, launch
from fsgd_tpu.evaluation import COCOEvaluator, inference_on_dataset, print_csv_format
from fsgd_tpu.models import build_model
from fsgd_tpu.parallel import create_train_state, make_train_step
from fsgd_tpu.solver import build_lr_scheduler, build_optimizer
from fsgd_tpu.utils import comm
from fsgd_tpu.utils.events import CommonMetricPrinter, EventStorage, JSONWriter

logger = logging.getLogger("fsgd_tpu.plain_train_net")


def do_test(cfg, model):
    results = {}
    for dataset_name in cfg.DATASETS.TEST:
        data_loader = build_detection_test_loader(cfg, dataset_name)
        evaluator = COCOEvaluator(dataset_name, cfg, True, output_dir=cfg.OUTPUT_DIR)
        results[dataset_name] = inference_on_dataset(model, data_loader, evaluator)
        if comm.is_main_process():
            print_csv_format(results[dataset_name])
    return results


def do_train(cfg, model, resume=False):
    optimizer = build_optimizer(cfg, model.params)
    scheduler = build_lr_scheduler(cfg)
    state = create_train_state(model.params, optimizer)
    step = make_train_step(model.loss_fn, optimizer)

    checkpointer = Checkpointer(cfg.OUTPUT_DIR, model=state.params, optimizer=state.opt_state)
    start_iter = int(checkpointer.resume_or_load(cfg.MODEL.WEIGHTS, resume=resume).get("iteration", -1)) + 1
    max_iter = cfg.SOLVER.MAX_ITER
    periodic_checkpointer = PeriodicCheckpointer(checkpointer, cfg.SOLVER.CHECKPOINT_PERIOD, max_iter=max_iter)

    writers = (
        [CommonMetricPrinter(max_iter), JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))]
        if comm.is_main_process()
        else []
    )
    data_loader = build_detection_train_loader(cfg)
    logger.info("Starting training from iteration {}".format(start_iter))
    rng = jax.random.PRNGKey(0)
    with EventStorage(start_iter) as storage:
        for data, iteration in zip(iter(data_loader), range(start_iter, max_iter)):
            storage.iter = iteration
            rng, step_rng = jax.random.split(rng)
            state, metrics = step(state, data, step_rng)
            model.params = state.params
            storage.put_scalars(
                **{k: float(v) for k, v in metrics.items() if k != "nonfinite"}, smoothing_hint=True
            )
            storage.put_scalar("lr", float(scheduler(iteration)), smoothing_hint=False)
            if cfg.TEST.EVAL_PERIOD > 0 and (iteration + 1) % cfg.TEST.EVAL_PERIOD == 0:
                do_test(cfg, model)
                comm.synchronize()
            if iteration - start_iter > 5 and ((iteration + 1) % 20 == 0 or iteration == max_iter - 1):
                for writer in writers:
                    writer.write()
            checkpointer.checkpointables.update(model=state.params, optimizer=state.opt_state)
            periodic_checkpointer.step(iteration)
            storage.step()


def main(args):
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)

    model = build_model(cfg)
    model.params = model.init_params(jax.random.PRNGKey(0), image_size=tuple(cfg.TPU.IMAGE_BUCKETS[0]))
    if args.eval_only:
        Checkpointer(cfg.OUTPUT_DIR, model=model.params).resume_or_load(cfg.MODEL.WEIGHTS, resume=args.resume)
        model.eval()
        return do_test(cfg, model)
    do_train(cfg, model, resume=args.resume)
    return do_test(cfg, model)


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    launch(main, args.num_gpus, num_machines=args.num_machines,
           machine_rank=args.machine_rank, dist_url=args.dist_url, args=(args,))
