"""SwapAlign2Nat — TensorMask's representation-transform op.

TPU-native replacement for
projects/TensorMask/tensormask/layers/csrc/SwapAlign2Nat/* (597 LoC CUDA) and
its wrapper tensormask/layers/swap_align2nat.py:9-60.

Semantics (SwapAlign2Nat_cuda.cu:54-140, 400-440): the input holds masks in
the *aligned* representation (B, Hin, Win, Vin*Uin) — at each pixel, channel
(v, u) is that window cell's mask value for the window *centered on the
pixel*.  The output is the *natural* representation with the unit lengths of
the window and spatial axes swapped by ``lambda_val``:

    Vout = lambda * Vin            Hout = ceil(Hin / lambda)
    out[y, x, (v, u)] = X[oy, ox, (ov, ou)]   (quadrilinear, pad outside)
      oy = y*lambda + v - Vout/2 + 0.5        ov = (v + 0.5)/lambda - 0.5
      ox = x*lambda + u - Uout/2 + 0.5        ou = (u + 0.5)/lambda - 0.5

Two entry points:
  * ``swap_align2nat`` — dense, full (B, Hout, Wout, Vout*Uout) tensor.
  * ``swap_align2nat_at`` — sparse: natural windows for K chosen output
    positions only.  The TPU bipyramid path uses this so the huge upper-level
    natural tensors (window (15*2^lvl)^2 per location) are never
    materialized; only selected foreground/candidate windows are gathered.

Both are pure gathers + bilinear math — vectorized, differentiable, jittable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["swap_align2nat", "swap_align2nat_at", "swap_align2nat_window"]


def _gather_quad(x: jnp.ndarray, oy, ox, ov, ou, pad_val):
    """Quadrilinear sample of aligned tensor x (H, W, V, U) at float coords.

    Broadcasts over the coordinate arrays' common shape; out-of-range taps
    (any of the 4 axes) contribute ``pad_val`` exactly like the reference's
    ``get_pixel_val`` (SwapAlign2Nat_cuda.cu:13-31).
    """
    h, w, v, u = x.shape

    yf = jnp.floor(oy).astype(jnp.int32)
    xf = jnp.floor(ox).astype(jnp.int32)
    vf = jnp.floor(ov).astype(jnp.int32)
    uf = jnp.floor(ou).astype(jnp.int32)
    wy = oy - yf
    wx = ox - xf
    wv = ov - vf
    wu = ou - uf

    def tap(yy, xx, vv, uu):
        ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w) & (vv >= 0) & (vv < v) & (uu >= 0) & (uu < u)
        val = x[
            jnp.clip(yy, 0, h - 1),
            jnp.clip(xx, 0, w - 1),
            jnp.clip(vv, 0, v - 1),
            jnp.clip(uu, 0, u - 1),
        ]
        return jnp.where(ok, val, pad_val)

    out = 0.0
    for dy, wy_ in ((0, 1.0 - wy), (1, wy)):
        for dx, wx_ in ((0, 1.0 - wx), (1, wx)):
            for dv, wv_ in ((0, 1.0 - wv), (1, wv)):
                for du, wu_ in ((0, 1.0 - wu), (1, wu)):
                    out = out + wy_ * wx_ * wv_ * wu_ * tap(yf + dy, xf + dx, vf + dv, uf + du)
    return out


def _out_coords(ys, xs, vs, us, lam, vout, uout):
    oy = ys * lam + vs - vout / 2.0 + 0.5
    ox = xs * lam + us - uout / 2.0 + 0.5
    ov = (vs + 0.5) / lam - 0.5
    ou = (us + 0.5) / lam - 0.5
    return oy, ox, ov, ou


def swap_align2nat(x: jnp.ndarray, lambda_val: int, pad_val: float = -6.0) -> jnp.ndarray:
    """Dense aligned -> natural transform.

    Args:
        x: (B, Hin, Win, U*U) aligned mask representation (NHWC).
        lambda_val: unit-length swap ratio (int >= 1).
        pad_val: fill for reads outside the tensor (logit of ~0 probability).

    Returns:
        (B, ceil(Hin/lambda), ceil(Win/lambda), (lambda*U)^2) natural rep.
    """
    lam = int(lambda_val)
    assert lam >= 1
    b, hin, win, u2 = x.shape
    uin = int(round(u2**0.5))
    assert uin * uin == u2, "channel count must be a square (U*U)"
    uout = lam * uin
    hout = int(math.ceil(hin / lam))
    wout = int(math.ceil(win / lam))

    ys = jnp.arange(hout, dtype=jnp.float32)[:, None, None, None]
    xs = jnp.arange(wout, dtype=jnp.float32)[None, :, None, None]
    vs = jnp.arange(uout, dtype=jnp.float32)[None, None, :, None]
    us = jnp.arange(uout, dtype=jnp.float32)[None, None, None, :]
    oy, ox, ov, ou = _out_coords(ys, xs, vs, us, float(lam), float(uout), float(uout))

    def per_image(xi):
        return _gather_quad(xi, oy, ox, ov, ou, pad_val)  # (Hout, Wout, Vout, Uout)

    out = jax.vmap(per_image)(x.reshape(b, hin, win, uin, uin))
    return out.reshape(b, hout, wout, uout * uout)


def swap_align2nat_at(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    lambda_val: int,
    pad_val: float = -6.0,
) -> jnp.ndarray:
    """Sparse natural windows at chosen output positions.

    Args:
        x: (Hin, Win, U*U) one image's aligned representation.
        positions: (K, 2) int (y, x) output-grid coordinates (natural grid,
            i.e. the ceil(Hin/lambda) x ceil(Win/lambda) grid).
        lambda_val: unit-length swap ratio (int >= 1).

    Returns:
        (K, lambda*U, lambda*U) natural windows — rows of the dense output.
    """
    lam = int(lambda_val)
    hin, win, u2 = x.shape
    uin = int(round(u2**0.5))
    assert uin * uin == u2
    uout = lam * uin

    xg = x.reshape(hin, win, uin, uin)
    ys = positions[:, 0].astype(jnp.float32)[:, None, None]
    xs = positions[:, 1].astype(jnp.float32)[:, None, None]
    vs = jnp.arange(uout, dtype=jnp.float32)[None, :, None]
    us = jnp.arange(uout, dtype=jnp.float32)[None, None, :]
    oy, ox, ov, ou = _out_coords(ys, xs, vs, us, float(lam), float(uout), float(uout))
    return _gather_quad(xg, oy, ox, ov, ou, pad_val)


def swap_align2nat_window(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    lambda_val: int,
    canvas: int,
    pad_val: float = -6.0,
) -> jnp.ndarray:
    """Natural windows at chosen positions, sampled straight onto a fixed
    ``canvas x canvas`` grid (2-tap bilinear over the window axes).

    Fuses ``swap_align2nat_at`` + window resize into ONE gather so the
    (lambda*U)^2 native window — up to 480^2 at P7 with lambda=32 — is never
    materialized.  Used by TensorMask bipyramid inference where all final
    detections share one mask canvas (static shapes).  Downsampling large
    windows point-samples rather than area-averages; windows are smooth
    sigmoid masks so this is a benign, documented deviation from keeping
    native sizes (reference arch.py:727-731).
    """
    lam = int(lambda_val)
    hin, win, u2 = x.shape
    uin = int(round(u2**0.5))
    assert uin * uin == u2
    uout = lam * uin

    xg = x.reshape(hin, win, uin, uin)
    ys = positions[:, 0].astype(jnp.float32)[:, None, None]
    xs = positions[:, 1].astype(jnp.float32)[:, None, None]
    # fractional window coordinates on the canvas (half-pixel centers)
    frac = (jnp.arange(canvas, dtype=jnp.float32) + 0.5) * (uout / canvas) - 0.5
    vs = frac[None, :, None]
    us = frac[None, None, :]
    oy, ox, ov, ou = _out_coords(ys, xs, vs, us, float(lam), float(uout), float(uout))
    return _gather_quad(xg, oy, ox, ov, ou, pad_val)
