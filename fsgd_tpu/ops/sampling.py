"""Random positive/negative minibatch subsampling with static shapes.

Parity with detectron2/modeling/sampling.py:7-50 (``subsample_labels``): pick
up to ``num_samples * positive_fraction`` positives and fill the rest with
negatives, uniformly at random without replacement.  The reference returns
variable-length index tensors; the TPU version returns fixed-size index
arrays plus validity masks, sampled by top-k over PRNG-keyed noise so the
whole train step stays one static XLA program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["subsample_labels", "subsample_labels_mask"]


def subsample_labels(
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    bg_label: int,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """
    Args:
        labels: (N,) integer labels; -1 = ignore, ``bg_label`` = background,
            anything else = positive.
        num_samples: total static sample budget.
        positive_fraction: target fraction of positives.
        bg_label: background label value.
        rng: PRNG key.

    Returns:
        pos_idx: (num_samples,) int32 indices (padded arbitrarily).
        pos_valid: (num_samples,) bool — first ``num_pos`` entries true.
        neg_idx, neg_valid: same for negatives.
    """
    n = labels.shape[0]
    positive = (labels != -1) & (labels != bg_label)
    negative = labels == bg_label

    num_pos_cap = int(num_samples * positive_fraction)
    pos_count = jnp.sum(positive)
    neg_count = jnp.sum(negative)
    num_pos = jnp.minimum(num_pos_cap, pos_count)
    num_neg = jnp.minimum(num_samples - num_pos, neg_count)

    k_pos, k_neg = jax.random.split(rng)
    # random permutation among the eligible set: noise masked to -inf elsewhere,
    # top-num_samples picks eligible entries in uniformly random order.
    pos_noise = jnp.where(positive, jax.random.uniform(k_pos, (n,)), -jnp.inf)
    neg_noise = jnp.where(negative, jax.random.uniform(k_neg, (n,)), -jnp.inf)
    k = min(num_samples, n)
    _, pos_idx = jax.lax.top_k(pos_noise, k)
    _, neg_idx = jax.lax.top_k(neg_noise, k)
    if k < num_samples:  # tiny-N edge case: pad by repeating index 0
        pad = jnp.zeros((num_samples - k,), dtype=pos_idx.dtype)
        pos_idx = jnp.concatenate([pos_idx, pad])
        neg_idx = jnp.concatenate([neg_idx, pad])

    slot = jnp.arange(num_samples)
    pos_valid = slot < num_pos
    neg_valid = slot < num_neg
    return pos_idx.astype(jnp.int32), pos_valid, neg_idx.astype(jnp.int32), neg_valid


def _threshold_mask(eligible: jnp.ndarray, num_keep: jnp.ndarray, cap: int, rng) -> jnp.ndarray:
    """Mask of exactly ``num_keep`` uniformly-random eligible slots.

    Selects the top-``num_keep`` by PRNG noise — the same set the index
    variant's top_k picks — but as a rank-threshold compare instead of a
    scatter (256 single-element scatter updates per image ran ~2.5 ms/step
    in the RPN at 268k anchors; this is two fused passes)."""
    n = eligible.shape[0]
    noise = jnp.where(eligible, jax.random.uniform(rng, (n,)), -jnp.inf)
    k = min(cap, n)
    top_vals, _ = jax.lax.top_k(noise, k)
    # k-th largest noise among eligible = selection threshold (ties have
    # measure zero for uniform floats)
    kth = top_vals[jnp.clip(num_keep - 1, 0, k - 1)]
    return eligible & (noise >= kth) & (num_keep > 0)


def subsample_labels_mask(
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    bg_label: int,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mask variant: returns (pos_mask, neg_mask) over the original N slots."""
    positive = (labels != -1) & (labels != bg_label)
    negative = labels == bg_label

    num_pos_cap = int(num_samples * positive_fraction)
    num_pos = jnp.minimum(num_pos_cap, jnp.sum(positive))
    num_neg = jnp.minimum(num_samples - num_pos, jnp.sum(negative))

    k_pos, k_neg = jax.random.split(rng)
    pos_mask = _threshold_mask(positive, num_pos, num_samples, k_pos)
    neg_mask = _threshold_mask(negative, num_neg, num_samples, k_neg)
    return pos_mask, neg_mask
