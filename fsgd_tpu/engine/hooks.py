"""Trainer hooks.

Parity with detectron2/engine/hooks.py:1-470: ``CallbackHook``,
``IterationTimer``, ``PeriodicWriter``, ``PeriodicCheckpointerHook``,
``LRScheduler`` (+ the fork's ``GamblerLRScheduler``/``DetectorLRScheduler``
split, hooks.py:232-251), ``EvalHook``, and ``ProfilerHook`` (the
``AutogradProfiler`` analogue built on jax.profiler traces).  ``PreciseBN``
is a no-op placeholder: detection backbones default to FrozenBN and SyncBN
statistics are computed inside the jitted step.
"""

from __future__ import annotations

import datetime
import logging
import os
import time
from typing import Callable, Optional

from ..checkpoint.checkpointer import PeriodicCheckpointer as _PeriodicCheckpointer
from ..utils import comm
from .train_loop import HookBase

__all__ = [
    "CallbackHook",
    "IterationTimer",
    "PeriodicWriter",
    "PeriodicCheckpointerHook",
    "LRScheduler",
    "GamblerLRScheduler",
    "DetectorLRScheduler",
    "EvalHook",
    "ProfilerHook",
    "PreciseBN",
]


class CallbackHook(HookBase):
    def __init__(self, *, before_train=None, after_train=None, before_step=None, after_step=None):
        self._before_train = before_train
        self._after_train = after_train
        self._before_step = before_step
        self._after_step = after_step

    def before_train(self):
        if self._before_train:
            self._before_train(self.trainer)

    def after_train(self):
        if self._after_train:
            self._after_train(self.trainer)

    def before_step(self):
        if self._before_step:
            self._before_step(self.trainer)

    def after_step(self):
        if self._after_step:
            self._after_step(self.trainer)


class IterationTimer(HookBase):
    """Track per-iteration time excluding hook overhead (reference hooks.py:74-140)."""

    def __init__(self, warmup_iter: int = 3):
        self._warmup_iter = warmup_iter
        self._start_time = time.perf_counter()
        self._total_timer_start = None
        self._step_timer_start = None
        self._paused = 0.0

    def before_train(self):
        self._start_time = time.perf_counter()
        self._total_timer_start = None

    def after_train(self):
        logger = logging.getLogger(__name__)
        total_time = time.perf_counter() - self._start_time
        num_iter = self.trainer.iter + 1 - self.trainer.start_iter - self._warmup_iter
        if num_iter > 0:
            logger.info(
                "Total training time: {} ({:.4f} s / it)".format(
                    str(datetime.timedelta(seconds=int(total_time))), total_time / max(num_iter, 1)
                )
            )

    def before_step(self):
        self._step_timer_start = time.perf_counter()

    def after_step(self):
        iter_done = self.trainer.iter - self.trainer.start_iter + 1
        if iter_done > self._warmup_iter:
            self.trainer.storage.put_scalar(
                "time", time.perf_counter() - self._step_timer_start, smoothing_hint=True
            )


class PeriodicWriter(HookBase):
    """Flush EventWriters every ``period`` iterations (reference hooks.py:143-170)."""

    def __init__(self, writers, period: int = 20):
        self._writers = writers
        self._period = period

    def after_step(self):
        if (self.trainer.iter + 1) % self._period == 0 or self.trainer.iter == self.trainer.max_iter - 1:
            for writer in self._writers:
                writer.write()

    def after_train(self):
        for writer in self._writers:
            writer.write()
            writer.close()


class PeriodicCheckpointerHook(HookBase):
    """Periodically snapshot trainer state.  ``state_getter`` returns the
    dict of pytrees to persist (so the checkpointer always sees fresh state)."""

    def __init__(self, checkpointer, period: int, state_getter: Optional[Callable] = None,
                 file_prefix: str = "model"):
        self._periodic = _PeriodicCheckpointer(checkpointer, period, file_prefix=file_prefix)
        self._state_getter = state_getter

    def before_train(self):
        self._periodic.max_iter = self.trainer.max_iter

    def after_step(self):
        if self._state_getter is not None:
            self._periodic.checkpointer.checkpointables.update(self._state_getter(self.trainer))
        self._periodic.step(self.trainer.iter)


class LRScheduler(HookBase):
    """Log the current LR (the schedule itself lives inside the optimizer)."""

    def __init__(self, schedule_fn: Callable[[int], float], name: str = "lr"):
        self._schedule_fn = schedule_fn
        self._name = name

    def after_step(self):
        self.trainer.storage.put_scalar(
            self._name, float(self._schedule_fn(self.trainer.iter)), smoothing_hint=False
        )


class GamblerLRScheduler(LRScheduler):
    """Fork hooks.py:232-241: logs the gambler optimizer's LR."""

    def __init__(self, schedule_fn):
        super().__init__(schedule_fn, name="lr/gambler")


class DetectorLRScheduler(LRScheduler):
    """Fork hooks.py:243-251: logs the detector optimizer's LR."""

    def __init__(self, schedule_fn):
        super().__init__(schedule_fn, name="lr/detector")


class EvalHook(HookBase):
    """Run ``eval_function`` every ``eval_period`` iters and at the end
    (reference hooks.py:319-394)."""

    def __init__(self, eval_period: int, eval_function: Callable):
        self._period = eval_period
        self._func = eval_function

    def _do_eval(self):
        results = self._func()
        if results:
            assert isinstance(results, dict), "EvalHook function must return a dict"
            flat = {}

            def _flatten(prefix, d):
                for k, v in d.items():
                    key = "{}/{}".format(prefix, k) if prefix else k
                    if isinstance(v, dict):
                        _flatten(key, v)
                    else:
                        try:
                            flat[key] = float(v)
                        except (TypeError, ValueError):
                            pass

            _flatten("", results)
            self.trainer.storage.put_scalars(**flat, smoothing_hint=False)
        comm.synchronize()

    def after_step(self):
        next_iter = self.trainer.iter + 1
        is_final = next_iter == self.trainer.max_iter
        if is_final or (self._period > 0 and next_iter % self._period == 0):
            self._do_eval()


class ProfilerHook(HookBase):
    """jax.profiler trace over predicate-selected iterations
    (replaces AutogradProfiler, reference hooks.py:254-316)."""

    def __init__(self, enable_predicate: Callable, output_dir: str):
        self._enable_predicate = enable_predicate
        self._output_dir = output_dir
        self._active = False

    def before_step(self):
        if self._enable_predicate(self.trainer):
            import jax

            os.makedirs(self._output_dir, exist_ok=True)
            jax.profiler.start_trace(self._output_dir)
            self._active = True

    def after_step(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            logging.getLogger(__name__).info("Wrote profiler trace to %s", self._output_dir)


class PreciseBN(HookBase):
    """Recompute FrozenBN statistics from live activations every ``period``
    iterations and at the end (reference hooks.py:397-470).

    The stats pass inverts each frozen affine from captured outputs — see
    ``fsgd_tpu/layers/precise_bn.py`` for the TPU design.  The updated
    params are installed into both the trainer state and the model.
    """

    def __init__(self, period: int, model, data_loader, num_iter: int):
        self._period = period
        self._model = model
        self._data_loader = data_loader
        self._num_iter = num_iter
        self._data_iter = None

    def _image_batches(self):
        if self._data_iter is None:
            self._data_iter = iter(self._data_loader)
        for _ in range(self._num_iter):
            batch = next(self._data_iter)
            yield batch["image"] if isinstance(batch, dict) else batch

    def update_stats(self):
        from ..layers.precise_bn import update_bn_stats

        trainer = self.trainer
        params = trainer.state.params if trainer is not None else self._model.params
        new_params = update_bn_stats(
            self._model.module, params, self._image_batches(), self._num_iter
        )
        self._model.params = new_params
        if trainer is not None:
            trainer.state = trainer.state._replace(params=new_params)

    def after_step(self):
        next_iter = self.trainer.iter + 1
        is_final = next_iter == self.trainer.max_iter
        if is_final or (self._period > 0 and next_iter % self._period == 0):
            self.update_stats()
