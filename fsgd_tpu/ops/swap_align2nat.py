"""SwapAlign2Nat — TensorMask's representation-transform op.

TPU-native replacement for
projects/TensorMask/tensormask/layers/csrc/SwapAlign2Nat/* (597 LoC CUDA) and
its wrapper tensormask/layers/swap_align2nat.py:9-60.

Semantics: the input holds masks in the *aligned* representation
(B, H, W, U*U) — at each pixel (y, x), channel (u, v) is the mask value of a
U x U window *centered on that pixel*.  The *natural* representation instead
reads, for window channel (u, v), the value stored at the pixel that the
window cell lands on: out[y, x, (u, v)] = in[y + (u - U//2) * lambda_val,
x + (v - U//2) * lambda_val, (u, v)] with bilinear interpolation at the
scaled offsets and ``pad_val`` outside.  Implemented as U*U static shifted
bilinear gathers — vectorized, differentiable, jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["swap_align2nat"]


def swap_align2nat(x: jnp.ndarray, lambda_val: float, pad_val: float = -6.0) -> jnp.ndarray:
    """
    Args:
        x: (B, H, W, U*U) aligned mask representation (NHWC).
        lambda_val: the unit-length swap ratio (feature stride ratio); the
            reference requires lambda_val >= 1.
        pad_val: fill value for out-of-image reads (logit of ~0 probability).

    Returns:
        (B, H, W, U*U) natural representation.
    """
    b, h, w, u2 = x.shape
    u = int(round(u2 ** 0.5))
    assert u * u == u2, "channel count must be a square (U*U)"
    half = (u - 1) / 2.0

    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    batch_idx = jnp.arange(b)[:, None, None]

    outs = []
    for uu in range(u):
        for vv in range(u):
            dy = (uu - half) * lambda_val
            dx = (vv - half) * lambda_val
            sy = ys + dy
            sx = xs + dx
            oob = (sy < 0) | (sy > h - 1) | (sx < 0) | (sx > w - 1)
            sy_c = jnp.clip(sy, 0, h - 1)
            sx_c = jnp.clip(sx, 0, w - 1)
            y0 = jnp.floor(sy_c).astype(jnp.int32)
            x0 = jnp.floor(sx_c).astype(jnp.int32)
            y1 = jnp.minimum(y0 + 1, h - 1)
            x1 = jnp.minimum(x0 + 1, w - 1)
            ly = sy_c - y0
            lx = sx_c - x0
            c = uu * u + vv
            plane = x[..., c]  # (B, H, W)

            def g(yy, xx):
                return plane[batch_idx, yy, xx]

            val = (
                g(y0, x0) * (1 - ly) * (1 - lx)
                + g(y0, x1) * (1 - ly) * lx
                + g(y1, x0) * ly * (1 - lx)
                + g(y1, x1) * ly * lx
            )
            outs.append(jnp.where(oob, pad_val, val))
    return jnp.stack(outs, axis=-1)
