"""Common machinery for meta-architectures.

Meta-archs are *functional*: a linen module plus pure jittable functions
``loss_fn(params, batch, rng)`` and ``inference_fn(params, batch)``.  A thin
object layer keeps the detectron2-style surface (``build_model(cfg)`` then
``model(batched_inputs)``, ``model.train()`` / ``model.eval()``) working on
top (reference API: detectron2/modeling/meta_arch/*).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..batching import batched_inputs_to_batch


def feature_grid_sizes(h: int, w: int, strides) -> List[Tuple[int, int]]:
    """Static per-level (H, W) grids for a padded input of (h, w)."""
    return [(int(math.ceil(h / s)), int(math.ceil(w / s))) for s in strides]


class DetectorBase:
    """Holds cfg + linen module; subclasses define loss_fn/inference_fn."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.training = True
        self.pixel_mean = jnp.asarray(cfg.MODEL.PIXEL_MEAN, jnp.float32)
        self.pixel_std = jnp.asarray(cfg.MODEL.PIXEL_STD, jnp.float32)
        self.max_gt = cfg.TPU.MAX_GT_PER_IMAGE
        # static shape buckets: every distinct padded (H, W) is one XLA
        # executable, so host inference pads into TPU.IMAGE_BUCKETS instead of
        # per-image size_divisibility rounding (which recompiles per shape)
        self.image_buckets = [tuple(b) for b in cfg.TPU.IMAGE_BUCKETS]
        self._jit_cache: Dict[Any, Any] = {}

    # -- torch-like mode switching (API compatibility) ----------------------
    def train(self, mode: bool = True):
        self.training = mode
        return self

    def eval(self):
        return self.train(False)

    # -- image normalization (reference preprocess_image) -------------------
    def normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        return (images - self.pixel_mean) / self.pixel_std

    def denormalize(self, images: jnp.ndarray) -> jnp.ndarray:
        """Fork's ``denormalizer`` (reference retinanet.py:104)."""
        return images * self.pixel_std + self.pixel_mean

    # -- parameters ---------------------------------------------------------
    def init_params(self, rng: jax.Array, image_size: Tuple[int, int] = (128, 128), batch: int = 1):
        dummy = jnp.zeros((batch, image_size[0], image_size[1], 3), jnp.float32)
        variables = self.module.init(rng, dummy)
        return variables["params"]

    @property
    def size_divisibility(self) -> int:
        return getattr(self.module, "size_divisibility", 32)

    # -- host-side conversion ----------------------------------------------
    def prepare_batch(self, batched_inputs: List[Dict]) -> Dict[str, np.ndarray]:
        return batched_inputs_to_batch(
            batched_inputs,
            max_gt=self.max_gt,
            size_divisibility=self.size_divisibility,
            buckets=self.image_buckets,
        )

    def _jitted(self, name: str, fn, donate=()):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn, donate_argnums=donate)
        return self._jit_cache[name]
