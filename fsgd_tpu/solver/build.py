"""Optimizer construction with detectron2's per-parameter groups.

Parity with detectron2/solver/build.py:10-32: SGD + momentum where biases get
``BASE_LR * BIAS_LR_FACTOR`` and ``WEIGHT_DECAY_BIAS``, normalization-layer
parameters get ``WEIGHT_DECAY_NORM``, everything else ``WEIGHT_DECAY``.
Weight decay is torch-style *coupled* (added to the gradient before momentum)
and the fork's ``clip_grad_norm_(10)`` (train_loop.py:228) is applied first.

Implemented as one optax chain over the param pytree with per-leaf factor
trees — a single fused update, no Python-side param groups.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .lr_scheduler import build_lr_scheduler

__all__ = ["build_optimizer", "build_sgd_optimizer", "classify_params"]

_NORM_SCOPE_TOKENS = ("frozenbatchnorm", "groupnorm", "batchnorm", "_norm", "norm_")
_NORM_PARAM_NAMES = ("running_mean", "running_var")


def classify_params(params) -> Tuple[Any, Any]:
    """Return (is_bias_tree, is_norm_tree) boolean pytrees.

    A leaf is a "norm" parameter when any scope in its path names a norm
    module; a "bias" when the leaf name is bias (and it's not a norm param).
    """

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    def path_str(path):
        return "/".join(str(getattr(p, "key", p)) for p in path).lower()

    # flax norm layers (GroupNorm/BatchNorm/LayerNorm) name their affine
    # parameters ("scale", "bias"); collect parents that own a "scale" leaf so
    # a norm bias is recognized even under a custom module name.
    scale_parents = {
        path_str(path).rsplit("/", 1)[0] for path, _ in flat if path_str(path).endswith("/scale")
    }

    is_bias, is_norm = [], []
    for path, _ in flat:
        p = path_str(path)
        parent, _, leaf_name = p.rpartition("/")
        norm = (
            any(tok in p for tok in _NORM_SCOPE_TOKENS)
            or leaf_name in _NORM_PARAM_NAMES
            or leaf_name == "scale"
            or (leaf_name == "bias" and parent in scale_parents)
        )
        bias = (not norm) and leaf_name in ("bias", "b")
        is_bias.append(bias)
        is_norm.append(norm)
    return (
        jax.tree_util.tree_unflatten(treedef, is_bias),
        jax.tree_util.tree_unflatten(treedef, is_norm),
    )


def _scale_by_leaf_factors(factors) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, f: u * f, updates, factors), state

    return optax.GradientTransformation(init_fn, update_fn)


def _add_coupled_weight_decay(wd_tree) -> optax.GradientTransformation:
    """grad += wd * param (torch-coupled decay with per-leaf wd)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        assert params is not None
        return jax.tree.map(lambda g, p, w: g + w * p, updates, params, wd_tree), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_sgd_optimizer(
    params,
    base_lr_schedule: Callable,
    momentum: float,
    weight_decay: float,
    weight_decay_norm: float,
    weight_decay_bias: float,
    bias_lr_factor: float = 1.0,
    clip_grad_norm: Optional[float] = 10.0,
    trainable_mask=None,
) -> optax.GradientTransformation:
    is_bias, is_norm = classify_params(params)

    wd_tree = jax.tree.map(
        lambda b, n: weight_decay_bias if b else (weight_decay_norm if n else weight_decay),
        is_bias,
        is_norm,
    )
    lr_factor_tree = jax.tree.map(lambda b: bias_lr_factor if b else 1.0, is_bias)
    if trainable_mask is not None:
        lr_factor_tree = jax.tree.map(lambda f, t: f if t else 0.0, lr_factor_tree, trainable_mask)

    chain = []
    if clip_grad_norm is not None and clip_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    chain.append(_add_coupled_weight_decay(wd_tree))
    if momentum:
        chain.append(optax.trace(decay=momentum, nesterov=False))
    chain.append(_scale_by_leaf_factors(lr_factor_tree))
    chain.append(optax.scale_by_schedule(lambda step: -base_lr_schedule(step)))
    return optax.chain(*chain)


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    """Build the detector optimizer from config."""
    schedule = build_lr_scheduler(cfg)
    return build_sgd_optimizer(
        params,
        base_lr_schedule=schedule,
        momentum=cfg.SOLVER.MOMENTUM,
        weight_decay=cfg.SOLVER.WEIGHT_DECAY,
        weight_decay_norm=cfg.SOLVER.WEIGHT_DECAY_NORM,
        weight_decay_bias=cfg.SOLVER.WEIGHT_DECAY_BIAS,
        bias_lr_factor=cfg.SOLVER.BIAS_LR_FACTOR,
        clip_grad_norm=10.0,
    )
