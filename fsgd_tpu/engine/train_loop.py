"""Training loop base classes.

Parity with detectron2/engine/train_loop.py:16-272: ``HookBase`` (4 phases),
``TrainerBase.train`` (hook loop under an EventStorage), ``SimpleTrainer``
(the standard one-model loop).  The reference's per-step side effects
(forward, backward, clip_grad_norm_(10), NaN detect_anomaly) all live inside
the jitted train step (fsgd_tpu/parallel/train_step.py); the host loop only
feeds batches, logs metrics, and raises on the step's non-finite flag.
"""

from __future__ import annotations

import logging
import time
import weakref
from typing import Dict, List, Optional

import jax
import numpy as np

from ..utils import comm
from ..utils.events import EventStorage

__all__ = ["HookBase", "TrainerBase", "SimpleTrainer"]


class HookBase:
    """Hooks are registered on a trainer and called at 4 points."""

    trainer = None  # weak proxy, set by TrainerBase.register_hooks

    def before_train(self):
        pass

    def after_train(self):
        pass

    def before_step(self):
        pass

    def after_step(self):
        pass


class TrainerBase:
    def __init__(self):
        self._hooks: List[HookBase] = []
        self.iter: int = 0
        self.start_iter: int = 0
        self.max_iter: int = 0
        self.storage: Optional[EventStorage] = None

    def register_hooks(self, hooks):
        hooks = [h for h in hooks if h is not None]
        for h in hooks:
            assert isinstance(h, HookBase)
            h.trainer = weakref.proxy(self)
        self._hooks.extend(hooks)

    def train(self, start_iter: int, max_iter: int):
        logger = logging.getLogger(__name__)
        logger.info("Starting training from iteration {}".format(start_iter))
        self.iter = self.start_iter = start_iter
        self.max_iter = max_iter

        with EventStorage(start_iter) as self.storage:
            try:
                self.before_train()
                for self.iter in range(start_iter, max_iter):
                    self.before_step()
                    self.run_step()
                    self.after_step()
            except Exception:
                logger.exception("Exception during training:")
                raise
            finally:
                self.after_train()

    def before_train(self):
        for h in self._hooks:
            h.before_train()

    def after_train(self):
        for h in self._hooks:
            h.after_train()

    def before_step(self):
        self.storage.iter = self.iter
        for h in self._hooks:
            h.before_step()

    def after_step(self):
        for h in self._hooks:
            h.after_step()
        self.storage.step()

    def run_step(self):
        raise NotImplementedError


class SimpleTrainer(TrainerBase):
    """Single-model single-optimizer loop over a jitted train step."""

    def __init__(self, model, data_loader, optimizer, mesh=None, metric_log_period=20):
        """
        Args:
            model: a DetectorBase with ``loss_fn(params, batch, rng)``.
            data_loader: iterable of host batch dicts.
            optimizer: optax transformation.
            mesh: optional jax Mesh for data parallelism.
            metric_log_period: materialize step metrics on the host every N
                iterations instead of every step.  A per-iter ``float(v)``
                blocks the dispatch pipeline on the device (and, through a
                remote-chip tunnel, adds a full round-trip per scalar);
                deferring keeps steps async and fetches N iterations of
                scalars in one transfer.  Logged values and their iteration
                tags are identical — only their materialization time moves.
                1 restores fully synchronous behavior.
        """
        super().__init__()
        from ..parallel import create_train_state, make_train_step, shard_batch

        self.model = model
        self.data_loader = data_loader
        self._data_loader_iter = iter(data_loader)
        self.optimizer = optimizer
        self.mesh = mesh
        self.metric_log_period = max(int(metric_log_period), 1)
        self._pending_metrics = []  # [(iter, device metric dict, data_time)]
        self._shard_batch = (lambda b: shard_batch(b, mesh)) if mesh is not None else (lambda b: b)
        self.train_step = make_train_step(model.loss_fn, optimizer, mesh=mesh)
        self.state = create_train_state(model.params, optimizer)
        self._rng = jax.random.PRNGKey(comm.shared_random_seed())

    @property
    def params(self):
        return self.state.params

    def run_step(self):
        start = time.perf_counter()
        batch = next(self._data_loader_iter)
        data_time = time.perf_counter() - start

        self._rng, step_rng = jax.random.split(self._rng)
        self.state, metrics = self.train_step(self.state, self._shard_batch(batch), step_rng)
        self.model.params = self.state.params
        self._pending_metrics.append((self.iter, metrics, data_time))
        # flush on the period boundary so after_step writers see fresh data
        if len(self._pending_metrics) >= self.metric_log_period or (
            self.iter + 1
        ) % self.metric_log_period == 0:
            self.flush_metrics()

    def after_train(self):
        self.flush_metrics()
        super().after_train()

    def flush_metrics(self):
        """Materialize and log all pending step metrics (one batched device
        transfer), preserving each step's iteration tag."""
        if not self._pending_metrics:
            return
        pending, self._pending_metrics = self._pending_metrics, []
        host_all = jax.device_get([m for (_, m, _) in pending])
        saved_iter = self.storage.iter if self.storage is not None else None
        try:
            for (it, _, data_time), host_m in zip(pending, host_all):
                host = {k: float(v) for k, v in host_m.items() if np.ndim(v) == 0}
                self._detect_anomaly(host, it)
                host["data_time"] = data_time
                if self.storage is not None:
                    self.storage.iter = it
                self._write_metrics(host)
        finally:
            if self.storage is not None and saved_iter is not None:
                self.storage.iter = saved_iter

    def _detect_anomaly(self, metrics: Dict[str, float], it=None):
        """Raise on non-finite loss (reference train_loop.py:235-241).

        With deferred metrics the raise can trail the bad step by up to
        ``metric_log_period`` iterations; the functional NaN-skip in the
        train step already guaranteed the bad update never touched params.
        """
        if metrics.get("nonfinite", 0.0) > 0:
            raise FloatingPointError(
                "Loss became infinite or NaN at iteration={}! Metrics: {}".format(
                    self.iter if it is None else it, metrics
                )
            )

    def _write_metrics(self, host: Dict[str, float]):
        """Host-side metric logging with cross-process reduction
        (reference train_loop.py:243-272)."""
        all_metrics = comm.gather(host)
        if comm.is_main_process():
            # data_time: max across workers; everything else: mean
            data_times = [m.pop("data_time") for m in all_metrics]
            reduced = {
                k: float(np.mean([m[k] for m in all_metrics])) for k in all_metrics[0].keys()
            }
            reduced["data_time"] = float(np.max(data_times))
            self.storage.put_scalar("data_time", reduced.pop("data_time"))
            nonfinite = reduced.pop("nonfinite", 0.0)
            del nonfinite
            self.storage.put_scalars(**reduced)
