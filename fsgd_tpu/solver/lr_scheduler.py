"""Learning-rate schedules.

Parity with detectron2/solver/lr_scheduler.py:16-117 (``WarmupMultiStepLR``,
``WarmupCosineLR``, ``_get_warmup_factor_at_iter``), expressed as pure
``step -> lr`` functions usable both as optax schedules (traced) and for
host-side logging.
"""

from __future__ import annotations

import math
from bisect import bisect_right
from typing import List, Sequence

import jax.numpy as jnp

__all__ = ["WarmupMultiStepLR", "WarmupCosineLR", "get_warmup_factor_at_iter", "build_lr_scheduler"]


def get_warmup_factor_at_iter(method: str, it, warmup_iters: int, warmup_factor: float):
    """Warmup multiplier at iteration ``it`` (traced or python int)."""
    if warmup_iters <= 0:
        return jnp.asarray(1.0) if not isinstance(it, int) else 1.0
    if method == "constant":
        if isinstance(it, int):
            return warmup_factor if it < warmup_iters else 1.0
        return jnp.where(it < warmup_iters, warmup_factor, 1.0)
    if method == "linear":
        alpha = jnp.minimum(jnp.asarray(it, jnp.float32) / warmup_iters, 1.0)
        return jnp.where(
            jnp.asarray(it) < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0
        )
    raise ValueError("Unknown warmup method: {}".format(method))


class WarmupMultiStepLR:
    """gamma-step decay at milestones with linear/constant warmup."""

    def __init__(
        self,
        base_lr: float,
        milestones: Sequence[int],
        gamma: float = 0.1,
        warmup_factor: float = 0.001,
        warmup_iters: int = 1000,
        warmup_method: str = "linear",
    ):
        milestones = list(milestones)
        assert milestones == sorted(milestones), "Milestones must be increasing: {}".format(milestones)
        self.base_lr = base_lr
        self.milestones = milestones
        self.gamma = gamma
        self.warmup_factor = warmup_factor
        self.warmup_iters = warmup_iters
        self.warmup_method = warmup_method

    def __call__(self, it):
        warmup = get_warmup_factor_at_iter(self.warmup_method, it, self.warmup_iters, self.warmup_factor)
        if isinstance(it, int):
            decay = self.gamma ** bisect_right(self.milestones, it)
            return self.base_lr * float(warmup) * decay
        # traced: decay = gamma ** (#milestones passed)
        it_arr = jnp.asarray(it)
        passed = sum((it_arr >= m).astype(jnp.float32) for m in self.milestones) if self.milestones else 0.0
        decay = self.gamma ** passed
        return self.base_lr * warmup * decay


class WarmupCosineLR:
    def __init__(
        self,
        base_lr: float,
        max_iters: int,
        warmup_factor: float = 0.001,
        warmup_iters: int = 1000,
        warmup_method: str = "linear",
    ):
        self.base_lr = base_lr
        self.max_iters = max_iters
        self.warmup_factor = warmup_factor
        self.warmup_iters = warmup_iters
        self.warmup_method = warmup_method

    def __call__(self, it):
        warmup = get_warmup_factor_at_iter(self.warmup_method, it, self.warmup_iters, self.warmup_factor)
        it_f = jnp.asarray(it, jnp.float32) if not isinstance(it, int) else float(it)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * it_f / self.max_iters))
        out = self.base_lr * warmup * cos
        return float(out) if isinstance(it, int) else out


def build_lr_scheduler(cfg):
    """Config-driven scheduler (reference solver/build.py:35-60)."""
    name = cfg.SOLVER.LR_SCHEDULER_NAME
    if name == "WarmupMultiStepLR":
        return WarmupMultiStepLR(
            cfg.SOLVER.BASE_LR,
            cfg.SOLVER.STEPS,
            gamma=cfg.SOLVER.GAMMA,
            warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
            warmup_iters=cfg.SOLVER.WARMUP_ITERS,
            warmup_method=cfg.SOLVER.WARMUP_METHOD,
        )
    if name == "WarmupCosineLR":
        return WarmupCosineLR(
            cfg.SOLVER.BASE_LR,
            cfg.SOLVER.MAX_ITER,
            warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
            warmup_iters=cfg.SOLVER.WARMUP_ITERS,
            warmup_method=cfg.SOLVER.WARMUP_METHOD,
        )
    raise ValueError("Unknown LR scheduler: {}".format(name))
