"""Ragged image batch -> padded NHWC tensor + true sizes.

Parity with detectron2/structures/image_list.py:50-103 (``ImageList`` with
``from_tensors`` and ``size_divisibility`` padding).  TPU adaptations:

* tensors are **NHWC** (TPU-native conv layout), not NCHW;
* an optional ``pad_to`` fixed (H, W) bucket pads every batch to one of a
  small set of static shapes so XLA compiles once per bucket (SURVEY.md
  section 7 "static padded shapes").
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class ImageList:
    """Holds a padded (B, H, W, C) tensor plus each image's true (h, w)."""

    def __init__(self, tensor, image_sizes: Sequence[Tuple[int, int]]):
        self.tensor = tensor
        self.image_sizes = [tuple(int(x) for x in s) for s in image_sizes]

    def tree_flatten(self):
        return (self.tensor,), tuple(self.image_sizes)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.tensor = children[0]
        obj.image_sizes = list(aux)
        return obj

    def __len__(self) -> int:
        return len(self.image_sizes)

    def __getitem__(self, idx) -> jnp.ndarray:
        """Access the un-padded image at index (h, w, C)."""
        size = self.image_sizes[idx]
        return self.tensor[idx, : size[0], : size[1], :]

    def to(self, *args, **kwargs) -> "ImageList":
        return self

    @property
    def device(self):
        return self.tensor.device

    @staticmethod
    def from_tensors(
        tensors: List,
        size_divisibility: int = 0,
        pad_value: float = 0.0,
        pad_to: Optional[Tuple[int, int]] = None,
    ) -> "ImageList":
        """Pad a list of HWC images into one batch tensor.

        Args:
            tensors: list of (h, w, C) arrays (numpy or jax).
            size_divisibility: pad H and W up to multiples of this (FPN needs 32).
            pad_value: fill value.
            pad_to: optional fixed (H, W) static bucket; must fit all images.
        """
        assert len(tensors) > 0
        image_sizes = [(int(t.shape[0]), int(t.shape[1])) for t in tensors]
        if pad_to is not None:
            max_h, max_w = pad_to
        else:
            max_h = max(s[0] for s in image_sizes)
            max_w = max(s[1] for s in image_sizes)
        if size_divisibility > 0:
            stride = size_divisibility
            max_h = (max_h + stride - 1) // stride * stride
            max_w = (max_w + stride - 1) // stride * stride

        batch = []
        for t in tensors:
            t = jnp.asarray(t)
            assert t.ndim == 3, "expected HWC image, got shape {}".format(t.shape)
            h, w = int(t.shape[0]), int(t.shape[1])
            assert h <= max_h and w <= max_w, (
                "image ({}, {}) exceeds pad bucket ({}, {})".format(h, w, max_h, max_w)
            )
            t = jnp.pad(
                t,
                ((0, max_h - h), (0, max_w - w), (0, 0)),
                constant_values=pad_value,
            )
            batch.append(t)
        return ImageList(jnp.stack(batch, axis=0), image_sizes)
