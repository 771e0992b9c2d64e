"""Keypoint structures and heatmap codecs.

Parity with detectron2/structures/keypoints.py:9-218 (``Keypoints``,
``_keypoints_to_heatmap``, ``heatmaps_to_keypoints``), written as pure jnp.

TPU adaptation of ``heatmaps_to_keypoints``: the reference upsamples each
(K, P, P) heatmap to the ROI's *dynamic* pixel size before the spatial argmax
(keypoints.py:142-218).  Dynamic shapes cannot live under jit, so we upsample
every map by a fixed integer factor (default 4x) and rescale the argmax bin
back through the same Heckbert continuous-discrete conversion.  This yields
sub-bin localization of fixed 1/(4P) roi-relative precision — equivalent in
expectation, and fully batched.
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


def heatmaps_to_keypoints(maps: jnp.ndarray, rois: jnp.ndarray, upscale: int = 4) -> jnp.ndarray:
    """Decode (N, K, P, P) heatmaps into (N, K, 4) = (x, y, logit, prob).

    Static-shape variant of reference keypoints.py:142-218 (see module doc).
    """
    num_rois, num_keypoints, ph, pw = maps.shape
    if num_rois == 0:
        return jnp.zeros((0, num_keypoints, 4), dtype=jnp.float32)

    offset_x = rois[:, 0]
    offset_y = rois[:, 1]
    widths = jnp.maximum(rois[:, 2] - rois[:, 0], 1.0)
    heights = jnp.maximum(rois[:, 3] - rois[:, 1], 1.0)

    up_h, up_w = ph * upscale, pw * upscale
    roi_maps = jax.image.resize(maps, (num_rois, num_keypoints, up_h, up_w), method="cubic")

    flat = roi_maps.reshape(num_rois, num_keypoints, -1)
    pos = jnp.argmax(flat, axis=-1)
    x_int = (pos % up_w).astype(jnp.float32)
    y_int = (pos // up_w).astype(jnp.float32)
    logit = jnp.max(flat, axis=-1)

    # spatial softmax normalized at pool resolution (reference lines 185-190)
    max_score = logit[..., None]
    pool_exp_sum = jnp.sum(
        jnp.exp(maps.reshape(num_rois, num_keypoints, -1) - max_score), axis=-1
    )
    prob = 1.0 / jnp.maximum(pool_exp_sum, 1e-12)  # exp(logit - max) == 1 at the argmax

    x = (x_int + 0.5) * (widths[:, None] / up_w)
    y = (y_int + 0.5) * (heights[:, None] / up_h)

    return jnp.stack(
        [x + offset_x[:, None], y + offset_y[:, None], logit, prob], axis=-1
    )
