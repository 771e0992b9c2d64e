"""Detection losses: sigmoid focal loss, smooth-L1, masked cross-entropy.

Parity with the fvcore losses used by the reference
(``sigmoid_focal_loss_jit`` in meta_arch/retinanet.py:233-241,
``smooth_l1_loss`` in rpn_outputs.py / fast_rcnn.py) and the fork's focal
Fast R-CNN variant (roi_heads/fast_rcnn.py:193-216).  Everything takes an
optional validity mask so padded anchors/instances contribute exactly zero.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "sigmoid_focal_loss",
    "sigmoid_focal_loss_star",
    "smooth_l1_loss",
    "sigmoid_cross_entropy",
    "softmax_cross_entropy",
    "focal_loss_softmax",
]


def sigmoid_cross_entropy(
    logits: jnp.ndarray, targets: jnp.ndarray, pos_weight: Optional[float] = None
) -> jnp.ndarray:
    """Numerically-stable elementwise BCE-with-logits.

    ``pos_weight`` scales the positive-target term exactly like torch's
    ``binary_cross_entropy_with_logits(pos_weight=...)`` (used by TensorMask,
    projects/TensorMask/tensormask/arch.py:485-491 with POSITIVE_WEIGHT).
    """
    # max(x, 0) - x * t + log(1 + exp(-|x|))
    softplus_neg_abs = jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if pos_weight is None:
        return jnp.maximum(logits, 0) - logits * targets + softplus_neg_abs
    # -[pw*t*log(sig(x)) + (1-t)*log(1-sig(x))]
    log_sig = jnp.minimum(logits, 0) - softplus_neg_abs  # log(sigmoid(x))
    log_one_minus = -jnp.maximum(logits, 0) - softplus_neg_abs  # log(1-sigmoid(x))
    return -(pos_weight * targets * log_sig + (1.0 - targets) * log_one_minus)


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    reduction: str = "none",
) -> jnp.ndarray:
    """RetinaNet focal loss (Lin et al.); matches fvcore's sigmoid_focal_loss.

    Args:
        logits/targets: same shape; targets are 0/1 per class.
    """
    p = jax.nn.sigmoid(logits)
    ce = sigmoid_cross_entropy(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        return jnp.mean(loss)
    return loss


def sigmoid_focal_loss_star(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = -1.0,
    gamma: float = 1.0,
    reduction: str = "none",
) -> jnp.ndarray:
    """FL* variant (RetinaNet paper appendix); matches fvcore's
    ``sigmoid_focal_loss_star``: BCE on gamma-scaled margin logits.

    Used by TensorMask's classification loss
    (projects/TensorMask/tensormask/arch.py:436-443 via
    ``sigmoid_focal_loss_star_jit``).
    """
    shifted = gamma * (logits * (2.0 * targets - 1.0))
    loss = -jax.nn.log_sigmoid(shifted) / gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        return jnp.mean(loss)
    return loss


def smooth_l1_loss(
    input: jnp.ndarray, target: jnp.ndarray, beta: float, reduction: str = "none"
) -> jnp.ndarray:
    """Huber-style smooth L1; beta=0 degenerates to pure L1 (fvcore semantics)."""
    diff = jnp.abs(input - target)
    if beta < 1e-5:
        loss = diff
    else:
        loss = jnp.where(diff < beta, 0.5 * diff ** 2 / beta, diff - 0.5 * beta)
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        return jnp.mean(loss)
    return loss


def softmax_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """CE over integer labels with optional validity mask (mean over valid)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    if valid is not None:
        nll = jnp.where(valid, nll, 0.0)
        denom = jnp.maximum(jnp.sum(valid), 1)
    else:
        denom = nll.size
    if reduction == "mean":
        return jnp.sum(nll) / denom
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


def focal_loss_softmax(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
    valid: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Softmax focal loss used by the fork's FasterRCNNFocalLoss
    (reference fast_rcnn.py:193-216): FL = -alpha * (1 - p_y)^gamma * log(p_y)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    log_py = jnp.take_along_axis(log_probs, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    py = jnp.exp(log_py)
    loss = -alpha * (1.0 - py) ** gamma * log_py
    if valid is not None:
        loss = jnp.where(valid, loss, 0.0)
        denom = jnp.maximum(jnp.sum(valid), 1)
    else:
        denom = loss.size
    if reduction == "mean":
        return jnp.sum(loss) / denom
    if reduction == "sum":
        return jnp.sum(loss)
    return loss
