"""Non-maximum suppression, TPU-native.

Replaces the reference's native NMS stack (torchvision ``nms``/``batched_nms``
used at detectron2/layers/nms.py:5-106 and the rotated NMS kernel at
detectron2/layers/csrc/nms_rotated/*).

Exact greedy NMS is a sequential recurrence (keep_i = no kept j<i overlaps i).
Instead of an O(N)-step scalar loop, we run the *parallel maximal-set
iteration*: every round simultaneously keeps all still-alive boxes that have
no higher-scored alive overlapper (these are exactly the boxes greedy NMS
would keep), then kills everything they suppress.  Each round is pure masked
matrix math on the VPU; rounds needed = depth of the suppression chain
(typically < 10), bounded by ``max_rounds``.  Results are bit-identical to
greedy NMS.

All entry points are static-shape / jittable; ``valid`` masks mark padding.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..structures.boxes import pairwise_iou
from .rotated_iou import pairwise_iou_rotated

__all__ = [
    "nms",
    "nms_mask",
    "nms_topk",
    "batched_nms",
    "batched_nms_mask",
    "nms_rotated",
    "nms_rotated_mask",
    "batched_nms_rotated",
]


def _nms_from_iou(iou: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
                  valid: Optional[jnp.ndarray], max_rounds: int) -> jnp.ndarray:
    """Core parallel-iteration NMS given a precomputed IoU matrix."""
    n = scores.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    # rank by (score desc, index asc) — stable, matching torchvision tie order
    neg_inf_scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-neg_inf_scores, stable=True)
    rank = jnp.argsort(order, stable=True)  # rank[i] = position of box i

    overlaps = (iou > iou_threshold) & valid[:, None] & valid[None, :]
    # j "dominates" i if j overlaps i and has better rank (higher score)
    dominates = overlaps & (rank[:, None] < rank[None, :])  # (j, i): j dominates i

    def cond(state):
        alive, keep, it = state
        return jnp.any(alive) & (it < max_rounds)

    def body(state):
        alive, keep, it = state
        # alive boxes with no alive dominator are exactly greedy-kept
        dominated = jnp.any(dominates & alive[:, None], axis=0)
        newly_kept = alive & ~dominated
        keep = keep | newly_kept
        # kill newly kept and everything they suppress
        suppressed = jnp.any(overlaps & newly_kept[:, None] & (rank[:, None] < rank[None, :]), axis=0)
        alive = alive & ~newly_kept & ~suppressed
        return alive, keep, it + 1

    alive0 = valid
    keep0 = jnp.zeros((n,), dtype=bool)
    _, keep, _ = jax.lax.while_loop(cond, body, (alive0, keep0, jnp.int32(0)))
    return keep


def _greedy_fixpoint_sorted(iou: jnp.ndarray, alive0: jnp.ndarray, iou_threshold,
                            max_rounds: int) -> jnp.ndarray:
    """Exact greedy keep-mask for boxes already sorted by descending score.

    Position order IS rank order, so domination is simply "earlier position".
    ``alive0`` marks boxes not yet suppressed (padding/prior tiles excluded).
    """
    t = iou.shape[0]
    pos = jnp.arange(t)
    dom = (iou > iou_threshold) & (pos[:, None] < pos[None, :])  # (j, i): j before i

    def cond(state):
        alive, _, it = state
        return jnp.any(alive) & (it < max_rounds)

    def body(state):
        alive, keep, it = state
        dominated = jnp.any(dom & alive[:, None], axis=0)
        newly = alive & ~dominated  # greedy-kept this round
        keep = keep | newly
        suppressed = jnp.any(dom & newly[:, None], axis=0)
        alive = alive & ~newly & ~suppressed
        return alive, keep, it + 1

    _, keep, _ = jax.lax.while_loop(
        cond, body, (alive0, jnp.zeros((t,), bool), jnp.int32(0))
    )
    return keep


def _nms_sorted_tiled(boxes: jnp.ndarray, valid: jnp.ndarray, iou_threshold,
                      tile: int = 128) -> jnp.ndarray:
    """Exact greedy NMS over score-sorted boxes, tiled for TPU.

    The naive greedy recurrence is K sequential steps; the full-matrix
    fixpoint materializes a (K, K) IoU matrix (O(K^2) HBM).  This runs a
    scan over K/tile tiles: an exact greedy fixpoint on the (tile, tile)
    block, then ONE vectorized (tile, K) suppression sweep against all
    later boxes.  Sequential depth K/tile; peak memory O(tile * K).
    Bit-identical to sequential greedy NMS.
    """
    k = boxes.shape[0]
    pad = (-k) % tile
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    kp = k + pad
    pos = jnp.arange(kp)

    def step(alive, t):
        start = t * tile
        tb = jax.lax.dynamic_slice(boxes, (start, 0), (tile, 4))
        ta = jax.lax.dynamic_slice(alive, (start,), (tile,))
        keep_t = _greedy_fixpoint_sorted(pairwise_iou(tb, tb), ta, iou_threshold, tile)
        # kept tile boxes suppress every later overlapping box
        sup = jnp.any((pairwise_iou(tb, boxes) > iou_threshold) & keep_t[:, None], axis=0)
        alive = alive & ~(sup & (pos >= start + tile))
        return alive, keep_t

    _, keeps = jax.lax.scan(step, valid, jnp.arange(kp // tile))
    return keeps.reshape(kp)[:k]


_TILED_MIN_K = 256  # below this the one-shot (K, K) fixpoint is cheaper


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: Optional[jnp.ndarray] = None,
    max_rounds: int = 0,
) -> jnp.ndarray:
    """Exact greedy NMS; returns a (N,) bool keep mask.  Jittable.

    Large N routes through the tiled sorted scan (sequential depth N/128,
    peak memory O(128 * N)); small N uses the one-shot (N, N) parallel
    fixpoint.  Both are bit-identical to sequential greedy NMS.
    """
    n = boxes.shape[0]
    if n == 0:
        return jnp.zeros((0,), dtype=bool)
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    if n >= _TILED_MIN_K:
        neg_inf_scores = jnp.where(valid, scores, -jnp.inf)
        order = jnp.argsort(-neg_inf_scores, stable=True)
        keep_sorted = _nms_sorted_tiled(boxes[order], valid[order], iou_threshold)
        return jnp.zeros((n,), bool).at[order].set(keep_sorted)
    iou = pairwise_iou(boxes, boxes)
    return _nms_from_iou(iou, scores, iou_threshold, valid, max_rounds or n)


def nms_rotated_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: Optional[jnp.ndarray] = None,
    max_rounds: int = 0,
) -> jnp.ndarray:
    """Rotated-box NMS keep mask ((N, 5) boxes).  Jittable.

    TPU equivalent of detectron2/layers/csrc/nms_rotated (247 LoC CUDA).
    """
    n = boxes.shape[0]
    if n == 0:
        return jnp.zeros((0,), dtype=bool)
    iou = pairwise_iou_rotated(boxes, boxes)
    return _nms_from_iou(iou, scores, iou_threshold, valid, max_rounds or n)


@partial(jax.jit, static_argnames=("iou_threshold", "topk"))
def nms_topk(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    topk: int,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NMS then take the best ``topk`` survivors by score.

    Returns (idx (topk,) int32 into the input, valid_mask (topk,) bool),
    ordered by descending score — the static-shape analogue of torchvision's
    sorted keep indices.
    """
    keep = nms_mask(boxes, scores, iou_threshold, valid)
    kept_scores = jnp.where(keep, scores, -jnp.inf)
    k = min(topk, boxes.shape[0])
    top_scores, idx = jax.lax.top_k(kept_scores, k)
    mask = top_scores > -jnp.inf
    if k < topk:
        idx = jnp.concatenate([idx, jnp.zeros((topk - k,), idx.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((topk - k,), bool)])
    return idx.astype(jnp.int32), mask


def _offset_by_class(boxes: jnp.ndarray, idxs: jnp.ndarray) -> jnp.ndarray:
    """Shift each class's boxes into a disjoint coordinate region
    (same trick as torchvision batched_nms, used by layers/nms.py:19-38)."""
    if boxes.shape[0] == 0:
        return boxes
    max_coordinate = jnp.max(boxes)
    offsets = idxs.astype(boxes.dtype) * (max_coordinate + 1.0)
    return boxes + offsets[:, None]


def batched_nms_mask(boxes, scores, idxs, iou_threshold, valid=None):
    """Per-class NMS keep mask via the coordinate-offset trick.  Jittable."""
    return nms_mask(_offset_by_class(boxes, idxs), scores, iou_threshold, valid)


def batched_nms_rotated_mask(boxes, scores, idxs, iou_threshold, valid=None):
    b = jnp.asarray(boxes)
    if b.shape[0] == 0:
        return jnp.zeros((0,), dtype=bool)
    # offset rotated box centers per class; w/h/angle unchanged
    max_coordinate = jnp.max(b[:, :2] + b[:, 2:4] / 2)
    offsets = idxs.astype(b.dtype) * (max_coordinate + 1.0)
    shifted = jnp.concatenate([b[:, :2] + offsets[:, None], b[:, 2:]], axis=1)
    return nms_rotated_mask(shifted, scores, iou_threshold, valid)


# -- host-convenience wrappers returning dynamic index arrays ----------------


def _mask_to_sorted_indices(keep_mask, scores) -> np.ndarray:
    keep_mask = np.asarray(keep_mask)
    scores = np.asarray(scores)
    idx = np.nonzero(keep_mask)[0]
    return idx[np.argsort(-scores[idx], kind="stable")]


def nms(boxes, scores, iou_threshold) -> np.ndarray:
    """torchvision-compatible: returns kept indices sorted by descending score."""
    return _mask_to_sorted_indices(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), iou_threshold), scores)


def batched_nms(boxes, scores, idxs, iou_threshold) -> np.ndarray:
    return _mask_to_sorted_indices(
        batched_nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), iou_threshold),
        scores,
    )


def nms_rotated(boxes, scores, iou_threshold) -> np.ndarray:
    return _mask_to_sorted_indices(
        nms_rotated_mask(jnp.asarray(boxes), jnp.asarray(scores), iou_threshold), scores
    )


def batched_nms_rotated(boxes, scores, idxs, iou_threshold) -> np.ndarray:
    return _mask_to_sorted_indices(
        batched_nms_rotated_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), iou_threshold),
        scores,
    )
