"""Deformable convolution (v1) and modulated deformable convolution (v2).

TPU-native replacement for detectron2/layers/csrc/deformable/* (2795 LoC of
CUDA-only kernels wrapped at detectron2/layers/deform_conv.py:15-447).

Design: a deformable conv is, per kernel tap (ky, kx), a bilinear gather of
the input at ``base_grid + dilation*tap + learned_offset`` followed by a
1x1-style matmul with that tap's weight slice.  We unroll the K*K static taps
(9 for the 3x3 convs detection uses), letting XLA fuse each gather into its
matmul on the MXU — no scalar loops, autodiff gives the backward passes the
reference hand-wrote in CUDA.

Layouts: NHWC input; offsets (B, Ho, Wo, G*K*K*2) ordered [g, tap, (dy, dx)]
(matching the torch channel order after NCHW->NHWC transposition); modulation
mask (B, Ho, Wo, G*K*K).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["deform_conv2d"]


def _bilinear_sample_dense(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample x (B, H, W, C) at float coords ys/xs (B, Ho, Wo); zero outside."""
    b, h, w, c = x.shape
    oob = (ys <= -1.0) | (ys >= h) | (xs <= -1.0) | (xs >= w)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    batch_idx = jnp.arange(b)[:, None, None]

    def g(yy, xx):
        return x[batch_idx, yy, xx, :]  # (B, Ho, Wo, C)

    w00 = ((1 - ly) * (1 - lx))[..., None]
    w01 = ((1 - ly) * lx)[..., None]
    w10 = (ly * (1 - lx))[..., None]
    w11 = (ly * lx)[..., None]
    val = g(y0i, x0i) * w00 + g(y0i, x1i) * w01 + g(y1i, x0i) * w10 + g(y1i, x1i) * w11
    return jnp.where(oob[..., None], 0.0, val)


def deform_conv2d(
    x: jnp.ndarray,  # (B, H, W, Cin)
    offset: jnp.ndarray,  # (B, Ho, Wo, G*K*K*2), [g, tap, (dy, dx)] order
    weight: jnp.ndarray,  # (K, K, Cin, Cout)
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    deform_groups: int = 1,
    mask: Optional[jnp.ndarray] = None,  # (B, Ho, Wo, G*K*K) for v2
) -> jnp.ndarray:
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    g = deform_groups
    assert cin % g == 0
    cg = cin // g
    k2 = kh * kw

    offset = offset.reshape(b, ho, wo, g, k2, 2)
    if mask is not None:
        mask = mask.reshape(b, ho, wo, g, k2)

    base_y = (jnp.arange(ho, dtype=jnp.float32) * stride - padding)[None, :, None]
    base_x = (jnp.arange(wo, dtype=jnp.float32) * stride - padding)[None, None, :]

    out = jnp.zeros((b, ho, wo, cout), dtype=jnp.float32)
    for ky in range(kh):
        for kx in range(kw):
            tap = ky * kw + kx
            w_tap = weight[ky, kx].astype(jnp.float32)  # (Cin, Cout)
            sampled_groups = []
            for gi in range(g):
                dy = offset[:, :, :, gi, tap, 0]
                dx = offset[:, :, :, gi, tap, 1]
                ys = base_y + ky * dilation + dy
                xs = base_x + kx * dilation + dx
                s = _bilinear_sample_dense(x[..., gi * cg : (gi + 1) * cg], ys, xs)
                if mask is not None:
                    s = s * mask[:, :, :, gi, tap][..., None]
                sampled_groups.append(s)
            sampled = jnp.concatenate(sampled_groups, axis=-1) if g > 1 else sampled_groups[0]
            out = out + jnp.einsum(
                "bhwc,cd->bhwd", sampled.astype(jnp.float32), w_tap, preferred_element_type=jnp.float32
            )
    if bias is not None:
        out = out + bias
    return out
