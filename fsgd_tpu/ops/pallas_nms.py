"""Greedy NMS as a Pallas TPU kernel.

The lax formulation (ops/nms.py) materializes the (k, k) IoU matrix in HBM
and iterates a masked fixpoint.  This kernel keeps everything in VMEM: boxes
live as four (1, K) SoA rows, and the exact greedy scan runs as K predicated
steps, each one VPU row of IoU against the current box — zero HBM traffic
after the initial DMA, bit-identical to sequential greedy NMS.

Inputs must be pre-sorted by descending score (done by the host-side wrapper
in ops/nms.py); K is padded to a lane multiple with invalid entries.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nms_sorted_pallas"]


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, thresh_ref, keep_ref):
    k = x1_ref.shape[1]
    x1 = x1_ref[0, :]
    y1 = y1_ref[0, :]
    x2 = x2_ref[0, :]
    y2 = y2_ref[0, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    thresh = thresh_ref[0, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)[0, :]

    def body(i, keep):
        # Mosaic has no dynamic lane extraction from VMEM vectors; read the
        # current box (and its keep bit) via one-hot masked reductions instead.
        sel = (col == i).astype(jnp.float32)
        ki = jnp.sum(keep.astype(jnp.float32) * sel)
        bx1 = jnp.sum(x1 * sel)
        by1 = jnp.sum(y1 * sel)
        bx2 = jnp.sum(x2 * sel)
        by2 = jnp.sum(y2 * sel)
        barea = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        union = area + barea - inter
        iou = jnp.where(union > 0.0, inter / jnp.where(union > 0.0, union, 1.0), 0.0)
        suppress = (iou > thresh) & (col > i) & (ki > 0.0)
        return jnp.where(suppress, 0, keep).astype(jnp.int32)

    keep = jax.lax.fori_loop(0, k, body, valid_ref[0, :])
    keep_ref[0, :] = keep


@partial(jax.jit, static_argnames=("interpret",))
def nms_sorted_pallas(
    boxes: jnp.ndarray,  # (K, 4) xyxy, sorted by descending score
    valid: jnp.ndarray,  # (K,) bool
    iou_threshold: float | jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Keep mask (K,) bool for score-sorted boxes."""
    k = boxes.shape[0]
    pad = (-k) % 128
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    kp = k + pad

    x1 = boxes[:, 0].reshape(1, kp)
    y1 = boxes[:, 1].reshape(1, kp)
    x2 = boxes[:, 2].reshape(1, kp)
    y2 = boxes[:, 3].reshape(1, kp)
    v = valid.astype(jnp.int32).reshape(1, kp)
    thresh = jnp.asarray(iou_threshold, jnp.float32).reshape(1, 1)

    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((1, kp), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(x1, y1, x2, y2, v, thresh)
    return keep[0, :k] > 0
