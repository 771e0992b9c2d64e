"""Keypoint structures and heatmap codecs.

Parity with detectron2/structures/keypoints.py:9-218 (``Keypoints``,
``_keypoints_to_heatmap``, ``heatmaps_to_keypoints``), written as pure jnp.

TPU adaptation of ``heatmaps_to_keypoints``: the reference bicubic-resamples
each (K, P, P) heatmap to the ROI's *dynamic* ceil(h)xceil(w) pixel size
before the spatial argmax (keypoints.py:142-218).  Dynamic shapes cannot live
under jit, so instead of materializing that grid we evaluate the SAME torch
bicubic interpolant (a = -0.75, align_corners=False, clamped borders) at the
reference's exact per-ROI sample phases, restricted to a static window around
the peak:

  1. coarse: pool-resolution argmax of the raw map;
  2. refine: evaluate the interpolant on a static 17x17 quarter-bin lattice
     around the coarse peak -> continuous-peak estimate good to ~1/8 bin;
  3. decide: snap to the nearest reference grid index j via the Heckbert
     inverse, evaluate an 11x11 window of EXACT reference phases
     x_src = (j + 0.5) * P / ceil(w) - 0.5, and argmax there.

For unimodal (peaked) maps the reference's global grid argmax lies inside
that window for any ROI size up to thousands of pixels, so positions, peak
logits, and the pool-normalized softmax probs reproduce the reference to
float precision — including the downsampling regime (ROI smaller than the
heatmap) where a fixed-upsample decode systematically overshoots the peak
amplitude the reference's sparser grid reports.
"""

from __future__ import annotations

from typing import Any, List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class Keypoints:
    """(N, K, 3) keypoints: x, y and COCO visibility (0/1/2)."""

    def __init__(self, keypoints):
        keypoints = jnp.asarray(keypoints, dtype=jnp.float32)
        if keypoints.size == 0:
            keypoints = keypoints.reshape(0, 0, 3)
        assert keypoints.ndim == 3 and keypoints.shape[2] == 3, keypoints.shape
        self.tensor = keypoints

    def tree_flatten(self):
        return (self.tensor,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.tensor = children[0]
        return obj

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def to(self, *args: Any, **kwargs: Any) -> "Keypoints":
        return self

    def to_heatmap(self, boxes, heatmap_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        boxes = boxes.tensor if hasattr(boxes, "tensor") else jnp.asarray(boxes)
        return keypoints_to_heatmap(self.tensor, boxes, heatmap_size)

    def __getitem__(self, item) -> "Keypoints":
        if isinstance(item, int):
            return Keypoints(self.tensor[item][None])
        return Keypoints(self.tensor[item])

    def __repr__(self) -> str:
        return "Keypoints(num_instances={})".format(len(self))

    @staticmethod
    def cat(kpts_list: List["Keypoints"]) -> "Keypoints":
        return Keypoints(jnp.concatenate([k.tensor for k in kpts_list], axis=0))


def keypoints_to_heatmap(
    keypoints: jnp.ndarray, rois: jnp.ndarray, heatmap_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode (N, K, 3) keypoints into (N, K) integer heatmap bins + validity.

    Heckbert 1990 continuous->discrete conversion, identical semantics to the
    reference keypoints.py:82-140 including the right/bottom boundary snap.
    """
    if rois.shape[0] == 0:
        return (
            jnp.zeros((0, keypoints.shape[1]), dtype=jnp.int32),
            jnp.zeros((0, keypoints.shape[1]), dtype=jnp.int32),
        )
    offset_x = rois[:, 0][:, None]
    offset_y = rois[:, 1][:, None]
    scale_x = (heatmap_size / (rois[:, 2] - rois[:, 0]))[:, None]
    scale_y = (heatmap_size / (rois[:, 3] - rois[:, 1]))[:, None]

    x = keypoints[..., 0]
    y = keypoints[..., 1]

    x_boundary = x == rois[:, 2][:, None]
    y_boundary = y == rois[:, 3][:, None]

    xi = jnp.floor((x - offset_x) * scale_x).astype(jnp.int32)
    yi = jnp.floor((y - offset_y) * scale_y).astype(jnp.int32)
    xi = jnp.where(x_boundary, heatmap_size - 1, xi)
    yi = jnp.where(y_boundary, heatmap_size - 1, yi)

    valid_loc = (xi >= 0) & (yi >= 0) & (xi < heatmap_size) & (yi < heatmap_size)
    vis = keypoints[..., 2] > 0
    valid = (valid_loc & vis).astype(jnp.int32)

    lin_ind = yi * heatmap_size + xi
    heatmaps = lin_ind * valid
    return heatmaps, valid


def _cubic_weights(t: jnp.ndarray) -> jnp.ndarray:
    """Torch bicubic convolution weights (a = -0.75) for fraction t in [0, 1).

    Returns (..., 4) weights for the taps at floor(x) + {-1, 0, 1, 2}.
    """
    a = -0.75
    # |distances| to the four taps: 1+t, t, 1-t, 2-t
    d0 = 1.0 + t
    d1 = t
    d2 = 1.0 - t
    d3 = 2.0 - t
    w0 = ((a * d0 - 5 * a) * d0 + 8 * a) * d0 - 4 * a  # 1 <= |x| < 2 branch
    w1 = ((a + 2) * d1 - (a + 3)) * d1 * d1 + 1  # |x| <= 1 branch
    w2 = ((a + 2) * d2 - (a + 3)) * d2 * d2 + 1
    w3 = ((a * d3 - 5 * a) * d3 + 8 * a) * d3 - 4 * a
    return jnp.stack([w0, w1, w2, w3], axis=-1)


def _bicubic_grid_eval(maps: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the torch-bicubic interpolant of (N, K, P, P) maps on the
    separable grid ys x xs (each (N, K, W)), with clamped border taps —
    identical sampling semantics to torch ``interpolate(mode='bicubic')``.

    Returns (N, K, Wy, Wx).
    """
    n, k, ph, pw = maps.shape
    wy = ys.shape[-1]
    wx = xs.shape[-1]

    x0 = jnp.floor(xs)
    tx = xs - x0
    wgt_x = _cubic_weights(tx)  # (N, K, Wx, 4)
    ix = jnp.clip(x0[..., None].astype(jnp.int32) + jnp.arange(-1, 3), 0, pw - 1)

    y0 = jnp.floor(ys)
    ty = ys - y0
    wgt_y = _cubic_weights(ty)  # (N, K, Wy, 4)
    iy = jnp.clip(y0[..., None].astype(jnp.int32) + jnp.arange(-1, 3), 0, ph - 1)

    # gather + reduce rows: (N, K, Wy, 4, P) -> (N, K, Wy, P)
    rows = jnp.take_along_axis(
        maps, iy.reshape(n, k, wy * 4, 1), axis=2
    ).reshape(n, k, wy, 4, pw)
    rows = jnp.einsum("nkwtp,nkwt->nkwp", rows, wgt_y)
    # gather + reduce cols: (N, K, Wy, Wx, 4) -> (N, K, Wy, Wx)
    cols = jnp.take_along_axis(
        rows, ix.reshape(n, k, 1, wx * 4), axis=3
    ).reshape(n, k, wy, wx, 4)
    return jnp.einsum("nkywt,nkwt->nkyw", cols, wgt_x)


def heatmaps_to_keypoints(maps: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
    """Decode (N, K, P, P) heatmaps into (N, K, 4) = (x, y, logit, prob).

    Static-shape reproduction of reference keypoints.py:142-218 (see module
    doc for the windowed-refinement scheme that replaces the reference's
    per-ROI dynamic resize).
    """
    num_rois, num_keypoints, ph, pw = maps.shape
    if num_rois == 0:
        return jnp.zeros((0, num_keypoints, 4), dtype=jnp.float32)
    maps = maps.astype(jnp.float32)

    offset_x = rois[:, 0]
    offset_y = rois[:, 1]
    widths = jnp.maximum(rois[:, 2] - rois[:, 0], 1.0)
    heights = jnp.maximum(rois[:, 3] - rois[:, 1], 1.0)
    w_ceil = jnp.ceil(widths)
    h_ceil = jnp.ceil(heights)
    # reference sample phase: x_src = (j + 0.5) * scale - 0.5
    scale_x = (pw / w_ceil)[:, None, None]  # (N, 1, 1)
    scale_y = (ph / h_ceil)[:, None, None]

    # 1. coarse peak at pool resolution
    flat = maps.reshape(num_rois, num_keypoints, -1)
    pos = jnp.argmax(flat, axis=-1)
    xc = (pos % pw).astype(jnp.float32)  # (N, K)
    yc = (pos // pw).astype(jnp.float32)

    # 2. continuous-peak estimate on a static quarter-bin lattice (+-2 bins)
    fine = jnp.arange(-8, 9, dtype=jnp.float32) / 4.0  # 17 offsets
    fx = xc[..., None] + fine  # (N, K, 17)
    fy = yc[..., None] + fine
    vals = _bicubic_grid_eval(maps, fx, fy)  # (N, K, 17, 17)
    fpos = jnp.argmax(vals.reshape(num_rois, num_keypoints, -1), axis=-1)
    x_peak = jnp.take_along_axis(fx, (fpos % 17)[..., None], axis=-1)[..., 0]
    y_peak = jnp.take_along_axis(fy, (fpos // 17)[..., None], axis=-1)[..., 0]

    # 3. argmax over an 11x11 window of EXACT reference grid phases
    j_c = jnp.round((x_peak[..., None] + 0.5) / scale_x - 0.5)  # (N, K, 1)
    i_c = jnp.round((y_peak[..., None] + 0.5) / scale_y - 0.5)
    win = jnp.arange(-5, 6, dtype=jnp.float32)  # 11 grid steps
    jj = jnp.clip(j_c + win, 0.0, w_ceil[:, None, None] - 1.0)  # (N, K, 11)
    ii = jnp.clip(i_c + win, 0.0, h_ceil[:, None, None] - 1.0)
    gx = (jj + 0.5) * scale_x - 0.5  # source coords of reference grid points
    gy = (ii + 0.5) * scale_y - 0.5
    gvals = _bicubic_grid_eval(maps, gx, gy)  # (N, K, 11, 11)
    gpos = jnp.argmax(gvals.reshape(num_rois, num_keypoints, -1), axis=-1)
    logit = jnp.max(gvals.reshape(num_rois, num_keypoints, -1), axis=-1)
    x_int = jnp.take_along_axis(jj, (gpos % 11)[..., None], axis=-1)[..., 0]
    y_int = jnp.take_along_axis(ii, (gpos // 11)[..., None], axis=-1)[..., 0]

    # spatial softmax normalized at pool resolution (reference lines 185-190):
    # numerator exp(logit - max) == 1 at the argmax of the interpolated map
    pool_exp_sum = jnp.sum(jnp.exp(flat - logit[..., None]), axis=-1)
    prob = 1.0 / jnp.maximum(pool_exp_sum, 1e-12)

    x = (x_int + 0.5) * (widths / w_ceil)[:, None]  # reference width_corrections
    y = (y_int + 0.5) * (heights / h_ceil)[:, None]

    return jnp.stack(
        [x + offset_x[:, None], y + offset_y[:, None], logit, prob], axis=-1
    )
