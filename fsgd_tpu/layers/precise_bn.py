"""PreciseBN: recompute frozen-BN statistics from live activations.

Parity target: detectron2/engine/hooks.py:397-470 (``PreciseBN`` hook) +
fvcore's ``update_bn_stats``: run N forward passes, average each BN layer's
per-batch mean/var, and install the averages as the layer's inference
statistics.

TPU design: statistics live in the 'params' collection
(``FrozenBatchNorm.running_mean/running_var``, layers/norms.py:19-41), so
there is no mutable batch_stats state to thread through jit.  Instead the
jitted stats pass captures every FrozenBatchNorm OUTPUT via flax
``capture_intermediates`` and inverts the layer's (frozen, known) affine to
recover exact input moments:

    out = x * scale + shift  =>  E[x] = (E[out] - shift) / scale
                                 Var[x] = Var[out] / scale^2

One compiled program per bucket shape; per-batch moments are averaged on
host exactly like fvcore (mean of batch means, mean of batch vars).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .norms import FrozenBatchNorm

logger = logging.getLogger(__name__)

__all__ = ["compute_bn_output_moments", "update_bn_stats_from_moments", "update_bn_stats"]


def _walk_intermediates(tree: Dict, prefix: Tuple[str, ...] = ()) -> Iterable[Tuple[Tuple[str, ...], Any]]:
    for k, v in tree.items():
        if k == "__call__":
            yield prefix, v[0]
        elif isinstance(v, dict):
            yield from _walk_intermediates(v, prefix + (k,))


def compute_bn_output_moments(module, params, images: jnp.ndarray):
    """Per-FrozenBN-layer (mean, mean_sq) of the OUTPUT over (N, H, W).

    Returns {path_tuple: (mean_c, meansq_c)}; jit-compatible."""
    _, inter = module.apply(
        {"params": params},
        images,
        capture_intermediates=lambda mdl, name: isinstance(mdl, FrozenBatchNorm),
        mutable=["intermediates"],
    )
    out = {}
    for path, val in _walk_intermediates(inter["intermediates"]):
        v = val.astype(jnp.float32)
        axes = tuple(range(v.ndim - 1))
        out[path] = (jnp.mean(v, axis=axes), jnp.mean(v * v, axis=axes))
    return out


def _params_subtree(params: Dict, path: Tuple[str, ...]) -> Dict:
    node = params
    for k in path:
        node = node[k]
    return node


def update_bn_stats_from_moments(params, moments: Dict[Tuple[str, ...], Tuple[np.ndarray, np.ndarray]], eps: float = 1e-5):
    """Invert each BN's frozen affine and install the recovered input stats.

    ``moments`` maps BN path -> averaged (E[out], Var[out]).  Returns new
    params (functional update)."""
    import copy

    new_params = copy.deepcopy(jax.tree.map(np.asarray, params))
    for path, (mean_out, var_out) in moments.items():
        bn = _params_subtree(new_params, path)
        weight = bn["weight"]
        bias = bn["bias"]
        old_mean = bn["running_mean"]
        old_var = bn["running_var"]
        scale = weight / np.sqrt(old_var + eps)
        # guard degenerate scales (weight == 0) — stats unrecoverable there
        safe = np.where(np.abs(scale) < 1e-12, np.where(scale < 0, -1e-12, 1e-12), scale)
        shift = bias - old_mean * scale
        bn["running_mean"] = ((mean_out - shift) / safe).astype(old_mean.dtype)
        bn["running_var"] = np.maximum(var_out / (safe * safe), 0.0).astype(old_var.dtype)
    return new_params


def update_bn_stats(module, params, image_batches: Iterable[np.ndarray], num_iters: int = 200):
    """Full PreciseBN pass: pool first/second moments over ``num_iters``
    batches (pooled variance; fvcore averages per-batch vars — identical for
    equal batch sizes up to the within-vs-between decomposition), return
    params with updated statistics."""
    stats_fn = jax.jit(lambda p, im: compute_bn_output_moments(module, p, im))
    acc: Dict[Tuple[str, ...], List] = {}
    n = 0
    for images in image_batches:
        if n >= num_iters:
            break
        mom = jax.device_get(stats_fn(params, jnp.asarray(images)))
        for path, (m, msq) in mom.items():
            a = acc.setdefault(path, [np.zeros_like(m), np.zeros_like(msq)])
            a[0] += m
            a[1] += msq
        n += 1
    if n == 0 or not acc:
        logger.warning("PreciseBN: no batches or no FrozenBN layers found; params unchanged")
        return params
    moments = {}
    for path, (sm, smsq) in acc.items():
        mean = sm / n
        mean_sq = smsq / n
        moments[path] = (mean, np.maximum(mean_sq - mean * mean, 0.0))
    logger.info("PreciseBN: updated %d BN layers from %d batches", len(moments), n)
    return update_bn_stats_from_moments(params, moments)
