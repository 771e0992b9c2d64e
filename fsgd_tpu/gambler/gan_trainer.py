"""GANTrainer: alternating gambler/detector training.

Parity with ImbalanceDetection/train_net.py:502-1200: two models + two
optimizers + two checkpoint streams; ``run_step`` trains the gambler for
``GAMBLER_ITERATIONS`` on detached detector predictions, then the detector
for ``DETECTOR_ITERATIONS`` with objective
``loss_box_reg * reg_lambda + loss_cls - outside_lambda * kappa * gambler_loss``
("cls+reg-gambler", train_net.py:1089-1124) or the weighted variant.

TPU redesign (SURVEY.md section 7 item 8): each phase is ONE jitted XLA
program — G-step takes gradients of the gambler objective w.r.t. gambler
params only (detector outputs stop-gradiented), D-step differentiates the
combined objective w.r.t. detector params only (gradients flow through the
frozen gambler network into the detector logits).  This replaces the
reference's two sequential backward passes with single fused compilations,
including the fork's clip_grad_norm_(10) on the detector.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.train_loop import TrainerBase
from ..parallel import TrainState, create_train_state, shard_batch
from ..solver import build_lr_scheduler, build_sgd_optimizer
from ..solver.lr_scheduler import WarmupMultiStepLR
from ..utils import comm
from .gambler_heads import build_detector, build_gambler

logger = logging.getLogger(__name__)


def build_optimizer_gambler(cfg, params):
    """Gambler optimizer: SGD or Adam per MODEL.GAMBLER_HEAD.OPTIMIZER
    (reference train_net.py:605-666)."""
    g = cfg.MODEL.GAMBLER_HEAD
    schedule = WarmupMultiStepLR(
        g.BASE_LR,
        cfg.SOLVER.STEPS,
        gamma=cfg.SOLVER.GAMMA,
        warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
        warmup_iters=cfg.SOLVER.WARMUP_ITERS,
        warmup_method=cfg.SOLVER.WARMUP_METHOD,
    )
    if g.OPTIMIZER == "adam":
        return optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.scale_by_adam(),
            optax.scale_by_schedule(lambda s: -schedule(s)),
        ), schedule
    return (
        build_sgd_optimizer(
            params,
            base_lr_schedule=schedule,
            momentum=g.MOMENTUM,
            weight_decay=g.WEIGHT_DECAY,
            weight_decay_norm=g.WEIGHT_DECAY_NORM,
            weight_decay_bias=g.WEIGHT_DECAY_BIAS,
            bias_lr_factor=g.BIAS_LR_FACTOR,
            clip_grad_norm=10.0,
        ),
        schedule,
    )


class GANTrainer(TrainerBase):
    def __init__(self, cfg, data_loader, mesh=None):
        super().__init__()
        self.cfg = cfg
        g = cfg.MODEL.GAMBLER_HEAD
        self.max_iter_gambler = g.GAMBLER_ITERATIONS
        self.max_iter_detector = g.DETECTOR_ITERATIONS
        self.gambler_loss_kappa = g.GAMBLER_KAPPA
        self.regression_loss_lambda = g.REGRESSION_LAMBDA
        self.gambler_outside_lambda = g.GAMBLER_OUTSIDE_LAMBDA
        self.detector_loss_mode = g.DETECTOR_LOSS_MODE
        self.vis_period = g.VIS_PERIOD
        self.iter_G = 0
        self.iter_D = 0

        self.detection_model = build_detector(cfg)
        self.gambler_model = build_gambler(cfg)

        bucket = tuple(cfg.TPU.IMAGE_BUCKETS[0])
        rng = jax.random.PRNGKey(cfg.SEED if cfg.SEED >= 0 else 0)
        r1, r2, self._rng = jax.random.split(rng, 3)
        det_params = self.detection_model.init_params(r1, image_size=bucket)
        gam_params = self.gambler_model.init_params(r2, image_hw=bucket)
        self.detection_model.params = det_params

        from ..solver import build_optimizer

        self.detection_optimizer = build_optimizer(cfg, det_params)
        self.detector_schedule = build_lr_scheduler(cfg)
        self.gambler_optimizer, self.gambler_schedule = build_optimizer_gambler(cfg, gam_params)

        self.det_state = create_train_state(det_params, self.detection_optimizer)
        self.gam_state = create_train_state(gam_params, self.gambler_optimizer)

        self.data_loader = data_loader
        self._data_loader_iter = iter(data_loader) if data_loader is not None else None
        self.mesh = mesh
        self._shard = (lambda b: shard_batch(b, mesh)) if mesh is not None else (lambda b: b)

        if mesh is not None:
            # data-parallel G/D phases: params/opt replicated, batch sharded on
            # "data"; the gradient all-reduce over ICI is inserted by GSPMD
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            self._g_step = jax.jit(
                self._g_step_fn,
                in_shardings=(repl, repl, data, repl),
                out_shardings=(repl, repl),
                donate_argnums=(1,),
            )
            self._d_step = jax.jit(
                self._d_step_fn,
                in_shardings=(repl, repl, data, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
        else:
            self._g_step = jax.jit(self._g_step_fn, donate_argnums=(1,))
            self._d_step = jax.jit(self._d_step_fn, donate_argnums=(0,))

    # -- the two jitted phase steps -----------------------------------------
    def _gambler_forward(self, det_params, gam_params, batch, detach_pred: bool):
        images, preds, gt_classes, mask, det_losses = self.detection_model.forward_train(
            det_params, batch
        )
        gambler_loss_dict, weights, betting_map = self.gambler_model.forward(
            gam_params,
            images,
            preds["pred_class_logits_levels"],
            gt_classes,
            mask,
            detach_pred=detach_pred,
        )
        return det_losses, gambler_loss_dict, weights, betting_map

    def _metrics(self, det_losses, gambler_loss_dict, weights, betting_map):
        """Mirror calc_log_metrics (reference train_net.py:1089-1124)."""
        loss_box_reg = det_losses["loss_box_reg"] * self.regression_loss_lambda
        loss_gambler = gambler_loss_dict["gambler_loss"] * self.gambler_loss_kappa
        if self.detector_loss_mode == "cls+reg-gambler":
            loss_detector = loss_box_reg + det_losses["loss_cls"] - self.gambler_outside_lambda * loss_gambler
        elif self.detector_loss_mode == "weighted_cls_with_gambler+reg":
            loss_detector = loss_box_reg - self.gambler_outside_lambda * loss_gambler
        else:
            raise ValueError("unknown DETECTOR_LOSS_MODE: {}".format(self.detector_loss_mode))

        sum_bets = sum(jnp.sum(b) for b in betting_map)
        numel = sum(np.prod(b.shape) for b in betting_map)
        max_bets = jnp.max(jnp.stack([jnp.max(b) for b in betting_map]))
        metrics = {
            "loss_cls": det_losses["loss_cls"],
            "loss_box_reg": loss_box_reg,
            "loss_gambler": loss_gambler,
            "loss_before_weighting": gambler_loss_dict["loss_before_weighting"],
            "loss_detector": loss_detector,
            "gambler_bets/sum": sum_bets,
            "gambler_bets/max": max_bets,
            "gambler_bets/mean": sum_bets / numel,
            "visualized weights/sum": jnp.sum(weights),
            "visualized weights/max": jnp.max(weights),
            "visualized weights/mean": jnp.mean(weights),
        }
        if "loss_gambler/lower_bound" in gambler_loss_dict:
            metrics["loss_gambler/lower_bound"] = gambler_loss_dict["loss_gambler/lower_bound"]
        return loss_detector, loss_gambler, metrics

    def _g_step_fn(self, det_params, gam_state: TrainState, batch, rng):
        def loss_fn(gam_params):
            det_losses, gld, weights, bets = self._gambler_forward(
                det_params, gam_params, batch, detach_pred=True
            )
            loss_g = gld["gambler_loss"] * self.gambler_loss_kappa
            return loss_g, (det_losses, gld, weights, bets)

        (loss_g, (det_losses, gld, weights, bets)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(gam_state.params)
        finite = jnp.isfinite(loss_g)
        grads = jax.tree.map(lambda x: jnp.where(finite, x, jnp.zeros_like(x)), grads)
        updates, opt_state = self.gambler_optimizer.update(grads, gam_state.opt_state, gam_state.params)
        new_params = optax.apply_updates(gam_state.params, updates)
        new_state = TrainState(new_params, opt_state, gam_state.step + 1)
        _, _, metrics = self._metrics(det_losses, gld, weights, bets)
        metrics["nonfinite"] = (~finite).astype(jnp.float32)
        return new_state, metrics

    def _d_step_fn(self, det_state: TrainState, gam_params, batch, rng):
        def loss_fn(det_params):
            det_losses, gld, weights, bets = self._gambler_forward(
                det_params, gam_params, batch, detach_pred=False
            )
            loss_detector, _, metrics = self._metrics(det_losses, gld, weights, bets)
            return loss_detector, metrics

        (loss_d, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(det_state.params)
        finite = jnp.isfinite(loss_d)
        grads = jax.tree.map(lambda x: jnp.where(finite, x, jnp.zeros_like(x)), grads)
        updates, opt_state = self.detection_optimizer.update(grads, det_state.opt_state, det_state.params)
        new_params = optax.apply_updates(det_state.params, updates)
        new_state = TrainState(new_params, opt_state, det_state.step + 1)
        metrics["nonfinite"] = (~finite).astype(jnp.float32)
        return new_state, metrics

    # -- host alternation loop ----------------------------------------------
    def run_step(self):
        if self.max_iter_gambler <= 0 and self.max_iter_detector <= 0:
            raise ValueError(
                "GANTrainer: both GAMBLER_ITERATIONS and DETECTOR_ITERATIONS are 0 "
                "— nothing to train (a step would silently consume data)"
            )
        # phase rollover happens before the batch fetch so no data is burned
        if self.iter_G >= self.max_iter_gambler and self.iter_D >= self.max_iter_detector:
            self.iter_G = 0
            self.iter_D = 0
        start = time.perf_counter()
        batch = self._shard(next(self._data_loader_iter))
        data_time = time.perf_counter() - start
        self._rng, rng = jax.random.split(self._rng)

        if self.iter_G < self.max_iter_gambler:
            self.gam_state, metrics = self._g_step(self.det_state.params, self.gam_state, batch, rng)
            self.iter_G += 1
            if self.iter_G == self.max_iter_gambler:
                logger.info("Finished training Gambler")
        elif self.iter_D < self.max_iter_detector:
            self.det_state, metrics = self._d_step(self.det_state, self.gam_state.params, batch, rng)
            self.detection_model.params = self.det_state.params
            self.iter_D += 1
            if self.iter_D == self.max_iter_detector:
                logger.info("Finished training Detector")
                self.iter_G = 0
                self.iter_D = 0

        self._write_metrics(metrics, data_time)
        if (
            self.vis_period > 0
            and self.storage is not None
            and self.storage.iter > 0
            and self.storage.iter % self.vis_period == 0
        ):
            self._visualize_step(batch)

    def _visualize_step(self, batch):
        """Betting/loss/GT grid dump every VIS_PERIOD iterations
        (fork train_net.py:1150-1160 visualize_training calls)."""
        try:
            from .visualization import visualize_training_

            images, preds, gt_classes, mask, _ = self.detection_model.forward_train(
                self.det_state.params, batch
            )
            loss_dict, _, betting_map = self.gambler_model.forward(
                self.gam_state.params, images,
                preds["pred_class_logits_levels"], gt_classes, mask, detach_pred=True,
            )
            visualize_training_(
                gt_classes, loss_dict["NAKHW_loss"], betting_map, np.asarray(images),
                self.cfg.MODEL.RETINANET.NUM_CLASSES, self.storage, self.cfg.OUTPUT_DIR,
                save_files=self.cfg.MODEL.GAMBLER_HEAD.SAVE_VIS_FILES,
                denormalizer=getattr(self.detection_model, "denormalize", None),
            )
        except Exception:
            logger.exception("gambler visualization failed (continuing training)")

    def _write_metrics(self, metrics: Dict, data_time: float):
        host = {k: float(v) for k, v in metrics.items() if np.ndim(v) == 0}
        if host.pop("nonfinite", 0.0) > 0:
            raise FloatingPointError("Loss became non-finite at iteration {}".format(self.iter))
        host["data_time"] = data_time
        all_metrics = comm.gather(host)
        if comm.is_main_process() and self.storage is not None:
            data_times = [m.pop("data_time") for m in all_metrics]
            reduced = {k: float(np.mean([m[k] for m in all_metrics])) for k in all_metrics[0]}
            reduced["data_time"] = float(np.max(data_times))
            self.storage.put_scalars(**reduced)
